package graft

import graft.operators.Chao
import org.scalatest.funsuite.AnyFunSuite

class ChaoSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Chao.chao1Of(rows.toDF("source", "term")).collect()
      .map(r => r.getAs[String]("source") -> r).toMap

  test("hand fixture: V=4 f1=2 f2=1 -> chao1 = V + f1(f1-1)/(2(f2+1))") {
    val rows = Seq("a", "b", "c", "c", "d", "d", "d", "d", "d")
      .map(t => ("s", t))
    val r = run(rows)("s")
    assert(r.getAs[Long]("v_types") == 4L && r.getAs[Long]("f1") == 2L &&
      r.getAs[Long]("f2") == 1L)
    assert(r.getAs[Long]("chao1_micro") == 4000000L + 2L * 1000000L / 4L)
    assert(r.getAs[Long]("unseen_micro") == 500000L)
    assert(r.getAs[Long]("coverage_micro") == 1000000L - 2000000L / 9L)
  }

  test("no singletons: zero unseen mass, full coverage") {
    val rows = Seq("a", "a", "b", "b", "b").map(t => ("s", t))
    val r = run(rows)("s")
    assert(r.getAs[Long]("unseen_micro") == 0L)
    assert(r.getAs[Long]("coverage_micro") == 1000000L)
  }

  test("all singletons (f2=0): bias-corrected form stays finite") {
    val rows = (0 until 6).map(i => ("s", s"t$i"))
    val r = run(rows)("s")
    // V + V(V-1)/2 = 6 + 15: the source estimates a large unseen tail
    assert(r.getAs[Long]("chao1_micro") == 21000000L)
    assert(r.getAs[Long]("coverage_micro") == 0L)
  }
}
