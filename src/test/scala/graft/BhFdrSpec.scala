package graft

import graft.operators.BhFdr
import org.scalatest.funsuite.AnyFunSuite

class BhFdrSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def armOf(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(md.take(7), 16) % 2 == 0) 1L else 0L
  }

  private def pvalsDf(ps: Seq[(String, Option[Long])]) =
    ps.map { case (s, p) => (s, 10L, p.map(_ => 0L), p) }
      .toDF("source", "n_units", "obs_diff_micro", "p_micro")

  test("step-up stair: k = 3 of 4 rejected at the exact thresholds") {
    // thresholds i*50000/4: 12500, 25000, 37500, 50000
    val out = BhFdr.bhStep(pvalsDf(Seq(
      "a" -> Some(10000L), "b" -> Some(20000L),
      "c" -> Some(36000L), "d" -> Some(900000L))))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Int]("bh_rejected")).toMap
    assert(out == Map("a" -> 1, "b" -> 1, "c" -> 1, "d" -> 0))
  }

  test("step-up rescue: a slice failing its OWN threshold is rejected " +
    "when a worse rank passes") {
    // m=2: rank-1 threshold 25000 (26000 fails), rank-2 50000 (40000 passes)
    val out = BhFdr.bhStep(pvalsDf(Seq(
      "a" -> Some(26000L), "b" -> Some(40000L))))
      .collect().map(_.getAs[Int]("bh_rejected"))
    assert(out.forall(_ == 1))
  }

  test("NULL p slices ride along unranked, never rejected, excluded from m") {
    val rows = BhFdr.bhStep(pvalsDf(Seq(
      "a" -> Some(10000L), "z" -> None, "b" -> Some(20000L))))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("z").isNullAt(rows("z").fieldIndex("bh_rejected")))
    assert(rows("z").isNullAt(rows("z").fieldIndex("p_rank")))
    assert(rows("a").getAs[Long]("n_tests") == 2L)
    assert(rows("a").getAs[Long]("p_rank") == 1L)
  }

  test("end to end: one hash-aligned slice discovered, null slices spared") {
    // "hot": y follows the observed arm hash exactly -> p at the floor;
    // five noise slices: y independent of every relabeling -> p large
    val hot = (0L until 200L).map(u =>
      ("hot", s"u$u", if (armOf(s"arm:u$u") == 1L) 1000L else 1L))
    val cold = for (s <- 0 until 5; u <- 0L until 50L)
      yield (s"cold$s", s"c$s:$u", 100L + (u * 2654435761L) % 13L)
    val out = BhFdr.bhOfSlices((hot ++ cold).toDF("source", "unit", "y"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Int]("bh_rejected")).toMap
    assert(out("hot") == 1)
    assert((0 until 5).forall(s => out(s"cold$s") == 0))
  }

  test("all-null family: every p at 1, zero discoveries") {
    val slices = for (s <- 0 until 4; u <- 0L until 40L)
      yield (s"s$s", s"$s:$u", 7L)
    val rows = BhFdr.bhOfSlices(slices.toDF("source", "unit", "y")).collect()
    assert(rows.forall(_.getAs[Long]("p_micro") == 1000000L))
    assert(rows.forall(_.getAs[Int]("bh_rejected") == 0))
  }
}
