package graft

import graft.operators.TimeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfNearestSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(left: Seq[(Long, Long)], right: Seq[(Long, Long, Long)],
    tol: Long) = {
    val l = left.toDF("user_id", "ts_us")
    val r = right.toDF("user_id", "ts_us", "click_id")
    TimeJoin.asOfNearest(l, r, "user_id", "ts_us", tol)
      .select(col("user_id"), col("ts_us"), col("near_click_id"),
        col("near_gap_us"), col("near_dir"))
      .as[(Long, Long, Option[Long], Option[Long], Option[String])]
      .collect().map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
  }

  test("picks the closer side; ties go to prior; equal instants match at gap 0") {
    val right = Seq((1L, 100L, 11L), (1L, 200L, 12L), (1L, 210L, 13L))
    val got = run(Seq((1L, 140L), (1L, 180L), (1L, 205L), (1L, 200L)),
      right, 1000L)
    assert(got((1L, 140L)) == ((Some(11L), Some(40L), Some("prior"))),
      "40 back beats 60 forward")
    assert(got((1L, 180L)) == ((Some(12L), Some(20L), Some("next"))),
      "20 forward beats 80 back")
    assert(got((1L, 205L)) == ((Some(12L), Some(5L), Some("prior"))),
      "tie at 5 goes to the prior side")
    assert(got((1L, 200L)) == ((Some(12L), Some(0L), Some("prior"))),
      "simultaneous right row matches at gap 0")
  }

  test("tolerance cuts BOTH directions; out-of-tolerance rows keep nulls") {
    val got = run(Seq((1L, 500L), (2L, 500L)),
      Seq((1L, 100L, 11L), (1L, 1000L, 12L)), 120L)
    assert(got((1L, 500L)) == ((None, None, None)),
      "400 back and 500 forward both exceed tol 120")
    assert(got((2L, 500L)) == ((None, None, None)), "keyless user unmatched")
    val wide = run(Seq((1L, 500L)), Seq((1L, 100L, 11L), (1L, 1000L, 12L)), 450L)
    assert(wide((1L, 500L)) == ((Some(11L), Some(400L), Some("prior"))),
      "within tol the closer (prior) side wins")
  }

  test("matches a brute nearest recount on the events fixture") {
    val out = TimeJoin.asOfNearestQuery(spark, sf)
      .select(col("event_id"), col("click_id"), col("gap_us"), col("dir"))
      .as[(Long, Option[Long], Option[Long], Option[String])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val ev = Tables.events(spark, sf)
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")))
      .as[(Long, Long, Long)].collect()
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("t"))
      .agg(max(col("event_id")).as("cid"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(c => (c._2, c._3))).toMap
    var matched = 0
    for ((eid, u, t) <- purch) {
      val cands = clicks.getOrElse(u, Array.empty[(Long, Long)])
        .filter(c => math.abs(c._1 - t) <= TimeJoin.NearTolUs)
      val want =
        if (cands.isEmpty) (None, None, None)
        else {
          val best = cands.minBy(c =>
            (math.abs(c._1 - t), if (c._1 <= t) 0 else 1))
          val prior = best._1 <= t
          (Some(best._2), Some(math.abs(best._1 - t)),
            Some(if (prior) "prior" else "next"))
        }
      assert(out(eid) == want, s"event $eid")
      if (want._1.nonEmpty) matched += 1
    }
    assert(matched > 50 && matched < purch.length,
      s"fixture must mix matched and unmatched: $matched/${purch.length}")
  }

  test("no inequality join in the plan: two windowed passes, no nested loop") {
    val plan = TimeJoin.asOfNearestQuery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"nearest must stay in the union+window shape:\n$plan")
  }
}
