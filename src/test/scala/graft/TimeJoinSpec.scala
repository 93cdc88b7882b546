package graft

import graft.operators.TimeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("asOfPrior matches per-key brute force, keeps unmatched lefts") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 100L, "d"), (3L, 7L, "e"))
      .toDF("k", "t", "lval")
    val right = Seq((1L, 8L, 80L), (1L, 15L, 150L), (1L, 20L, 200L),
      (2L, 101L, 1010L))
      .toDF("k", "t", "rval")
    val got = TimeJoin.asOfPrior(left, right, "k", "t")
      .select("k", "t", "lval", "asof_t", "asof_rval")
      .as[(Long, Long, String, Option[Long], Option[Long])]
      .collect().map(r => (r._1, r._2) -> (r._4, r._5)).toMap
    assert(got.size == 5, "no left row dropped")
    assert(got((1L, 10L)) == (Some(8L), Some(80L)), "latest at-or-before")
    assert(got((1L, 20L)) == (Some(20L), Some(200L)), "equal ts matches (>= convention)")
    assert(got((1L, 5L)) == (None, None), "no prior right row")
    assert(got((2L, 100L)) == (None, None), "right strictly after")
    assert(got((3L, 7L)) == (None, None), "key with no right rows")
  }

  test("asOfPrior carries a matched row's null field, not an older value") {
    val left = Seq((1L, 30L)).toDF("k", "t")
    val right = Seq((1L, 10L, Some(99L)), (1L, 20L, None))
      .toDF("k", "t", "rval")
    val row = TimeJoin.asOfPrior(left, right, "k", "t")
      .select("asof_t", "asof_rval")
      .as[(Option[Long], Option[Long])].head()
    assert(row._1 == Some(20L), "matches the latest right row")
    assert(row._2 == None, "its null field stays null (struct carry)")
  }

  test("pointsInIntervals equals brute force; half-open; no duplicate pairs") {
    val pts = (0L until 200L by 3L).map(t => (t, s"p$t")).toDF("t", "pid")
    val ivs = Seq((0L, 10L, 20L), (1L, 15L, 40L), (2L, 40L, 50L), (3L, 190L, 300L),
      (4L, 55L, 56L))
      .toDF("iid", "lo", "hi")
    val got = TimeJoin.pointsInIntervals(pts, ivs, "t", "lo", "hi", bucketWidth = 25L)
      .select("iid", "t").as[(Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size, "a pair must land exactly once")
    val brute = for {
      (t, _) <- (0L until 200L by 3L).map(t => (t, s"p$t"))
      (iid, lo, hi) <- Seq((0L, 10L, 20L), (1L, 15L, 40L), (2L, 40L, 50L),
        (3L, 190L, 300L), (4L, 55L, 56L))
      if t >= lo && t < hi
    } yield (iid, t)
    assert(got.sorted == brute.sorted)
  }

  test("intervalsOverlap equals brute force; canonical cell yields no duplicate pairs") {
    // spans of 1..5 cells at width 10, adjacent (touching) intervals must NOT pair
    val ivs = Seq((0L, 0L, 10L), (1L, 5L, 35L), (2L, 10L, 12L), (3L, 34L, 80L),
      (4L, 80L, 90L), (5L, 7L, 8L), (6L, 40L, 41L))
    val a = ivs.toDF("a_id", "a_lo", "a_hi")
    val b = ivs.toDF("b_id", "b_lo", "b_hi")
    val got = TimeJoin.intervalsOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 10L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size, "a pair must land exactly once")
    val brute = for {
      (ai, alo, ahi) <- ivs; (bi, blo, bhi) <- ivs
      if alo < bhi && blo < ahi
    } yield (ai, bi)
    assert(got.sorted == brute.sorted)
  }

  test("asOf and range query plans stay equi-join/window shaped") {
    for (q <- Seq(TimeJoin.asOfJoinQuery(spark, sf), TimeJoin.rangeJoinQuery(spark, sf),
      TimeJoin.overlapJoinQuery(spark, sf))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop"), "inequality join leaked into the plan")
      assert(!plan.contains("CartesianProduct"), "cartesian leaked into the plan")
    }
  }

  test("oracle queries return rows with expected coverage at sf0.001") {
    val asof = TimeJoin.asOfJoinQuery(spark, sf)
    val n = asof.count()
    assert(n > 0)
    assert(asof.filter(col("click_id").isNotNull).count() > 0, "some purchase has a prior click")
    val rj = TimeJoin.rangeJoinQuery(spark, sf)
    assert(rj.count() > 0)
    assert(rj.agg(sum("n_purchases")).head.getLong(0) >= 0)
  }
}
