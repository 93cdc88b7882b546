package graft

import graft.operators.Hhi
import org.scalatest.funsuite.AnyFunSuite

class HhiSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Hhi.hhiOf(rows.toDF("slice", "holder")).collect()
      .map(r => r.getAs[String]("slice") -> r).toMap

  test("monopoly slice: HHI exactly 1.0, one effective holder") {
    val out = run(Seq.fill(9)(("mono", "only")))
    assert(out("mono").getAs[Long]("hhi_micro") == 1000000L)
    assert(out("mono").getAs[Long]("eff_holders_micro") == 1000000L)
    assert(out("mono").getAs[String]("band") == "concentrated")
  }

  test("k equal holders: HHI exactly 1/k, k effective holders") {
    val rows = for (h <- 0 until 8; _ <- 0 until 5) yield ("eq", s"h$h")
    val out = run(rows)
    assert(out("eq").getAs[Long]("hhi_micro") == 1000000L / 8L)
    assert(out("eq").getAs[Long]("eff_holders_micro") == 8000000L)
    assert(out("eq").getAs[String]("band") == "unconcentrated")
  }

  test("hand shares 3/4 and 1/4: HHI = 10/16 exactly") {
    val out = run(Seq.fill(3)(("s", "big")) ++ Seq(("s", "small")))
    assert(out("s").getAs[Long]("hhi_micro") == 625000L)
    assert(out("s").getAs[Long]("eff_holders_micro") == 1600000L)
  }

  test("DOJ bands: 5 equal holders sit exactly on moderate") {
    val rows = for (h <- 0 until 5; _ <- 0 until 4) yield ("m", s"h$h")
    val out = run(rows)
    assert(out("m").getAs[Long]("hhi_micro") == 200000L)
    assert(out("m").getAs[String]("band") == "moderate")
  }
}
