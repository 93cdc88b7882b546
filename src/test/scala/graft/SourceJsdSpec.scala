package graft

import graft.operators.SourceJsd
import org.scalatest.funsuite.AnyFunSuite

class SourceJsdSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    SourceJsd.jsdOf(rows.toDF("source", "term")).collect()
      .map(r => ((r.getAs[String]("src_a"), r.getAs[String]("src_b")), r))
      .toMap

  test("identical profiles: JSD exactly 0") {
    val prof = Seq("x", "x", "y", "z")
    val rows = prof.map(("a", _)) ++ prof.map(("b", _))
    val r = run(rows)(("a", "b"))
    assert(r.getAs[Long]("jsd_micro") == 0L)
    assert(r.getAs[Long]("n_shared_terms") == 3L)
  }

  test("disjoint vocabularies: the pair still rides, at exactly ln 2") {
    val rows = Seq(("a", "x"), ("a", "y"), ("b", "p"), ("b", "q"), ("b", "q"))
    val r = run(rows)(("a", "b"))
    assert(r.getAs[Long]("n_shared_terms") == 0L)
    assert(r.getAs[Long]("jsd_micro") == 693147L)
  }

  test("proportional profiles (scaled counts): JSD exactly 0") {
    // b is a doubled a: same distribution, different mass
    val rows = Seq(("a", "x"), ("a", "y")) ++
      Seq(("b", "x"), ("b", "x"), ("b", "y"), ("b", "y"))
    val r = run(rows)(("a", "b"))
    assert(r.getAs[Long]("jsd_micro") == 0L)
  }

  test("near-duplicate sources read far below an unrelated pair") {
    val base = Seq("t1", "t2", "t3", "t4", "t5", "t6", "t7", "t8")
    val rows = base.map(("a", _)) ++
      (base.dropRight(1) :+ "t9").map(("b", _)) ++ // one swapped term
      (0 until 8).map(i => ("c", s"other$i"))      // disjoint source
    val out = run(rows)
    assert(out(("a", "b")).getAs[Long]("jsd_micro") <
      out(("a", "c")).getAs[Long]("jsd_micro"))
    assert(out(("a", "c")).getAs[Long]("jsd_micro") == 693147L)
  }

  test("matrix is the full upper triangle of the source census") {
    val rows = for (s <- Seq("a", "b", "c", "d"); t <- Seq("w", s"only$s"))
      yield (s, t)
    assert(run(rows).size == 6) // C(4,2)
  }
}
