package graft

import graft.operators.Keyness
import org.scalatest.funsuite.AnyFunSuite

class KeynessSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Keyness.keynessOf(rows.toDF("source", "term")).collect()

  test("a planted source-exclusive term tops that source's list") {
    val common = for (s <- Seq("a", "b"); _ <- 0 until 30) yield (s, "the")
    val planted = Seq.fill(20)(("a", "zebra"))
    val out = run(common ++ planted)
    val aTop = out.filter(_.getAs[String]("source") == "a")
      .minBy(_.getAs[Long]("rank"))
    assert(aTop.getAs[String]("term") == "zebra")
    assert(aTop.getAs[Double]("z") > 0.0)
    // within a's list the shared term ranks strictly below the planted
    // one (for b, "the" IS distinctive — b uses nothing else)
    val aThe = out.find(r => r.getAs[String]("source") == "a" &&
      r.getAs[String]("term") == "the")
    assert(aThe.forall(_.getAs[Double]("z") < aTop.getAs[Double]("z")))
  }

  test("mirrored corpus: each source's planted term wins symmetrically") {
    val rows = Seq.fill(25)(("a", "alpha")) ++ Seq.fill(25)(("b", "beta")) ++
      (for (s <- Seq("a", "b"); _ <- 0 until 40) yield (s, "filler"))
    val out = run(rows)
    val tops = out.filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(tops("a").getAs[String]("term") == "alpha")
    assert(tops("b").getAs[String]("term") == "beta")
    // exact mirror: same counts both ways -> identical delta magnitude
    assert(tops("a").getAs[Long]("delta_micro") ==
      tops("b").getAs[Long]("delta_micro"))
  }

  test("vocab floor: a 4-occurrence term never appears") {
    val rows = Seq.fill(4)(("a", "rare")) ++
      (for (s <- Seq("a", "b"); _ <- 0 until 20) yield (s, "base"))
    val out = run(rows)
    assert(!out.exists(_.getAs[String]("term") == "rare"))
  }

  test("at most TopK rows per source, ranks contiguous from 1") {
    val rows = for (s <- Seq("a", "b"); t <- 0 until 12; _ <- 0 until 6)
      yield (s, s"$s-t$t")
    val out = run(rows)
    out.groupBy(_.getAs[String]("source")).foreach { case (_, g) =>
      assert(g.length <= Keyness.TopK)
      assert(g.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to g.length.toLong).toSeq)
    }
  }
}
