package graft

import java.sql.Timestamp
import graft.operators.Autocorr
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AutocorrSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** (hour index, type, count) → event rows at that hour. */
  private def ev(rows: Seq[(Long, String, Long)]) =
    rows.zipWithIndex.flatMap { case ((hr, t, n), i) =>
      (1L to n).map(j =>
        (i * 100000L + j, 1L, new Timestamp(hr * 3600L * 1000), t))
    }.toDF("event_id", "user_id", "ts", "event_type")

  private def acfMap(feed: org.apache.spark.sql.DataFrame) =
    Autocorr.autocorr(feed)
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

  test("a daily rhythm peaks at lag 24 and its harmonics, not at 1") {
    // two weeks of 10-per-hour with 200 at noon: period 24
    val feed = ev((0L until 336L).map(h =>
      (h, "load", if (h % 24 == 12) 200L else 10L)))
    val m = acfMap(feed)
    val a24 = m(("load", 24L))._2.get
    val a48 = m(("load", 48L))._2.get
    val a1 = m(("load", 1L))._2.get
    // the biased estimator sums n-k products over an n-term denominator,
    // so a perfect rhythm scores ~(n-k)/n: 312/336 and 288/336 here
    assert(a24 > 0.9, s"daily rhythm must autocorrelate at 24: $a24")
    assert(a48 > 0.8, s"and at the 48h harmonic: $a48")
    assert(a1 < 0.1, s"but not at persistence lag 1: $a1")
    // the ladder carries every candidate period with the right pair counts
    assert(m.keySet.map(_._2) == Autocorr.Lags.toSet)
    assert(m(("load", 24L))._1 == 336L - 24L)
    assert(m(("load", 168L))._1 == 336L - 168L)
  }

  test("a weekly rhythm separates 168 from 24 — the Seasonal period justification") {
    // busy Mondays only: period 168, not 24
    val feed = ev((0L until 504L).map(h =>
      (h, "load", if (h % 168 < 24) 100L else 10L)))
    val m = acfMap(feed)
    val a168 = m(("load", 168L))._2.get
    val a24 = m(("load", 24L))._2.get
    // biased estimator ceiling at n=504, k=168 is (504-168)/504 = 0.667
    assert(a168 > 0.6, s"weekly rhythm must autocorrelate at 168: $a168")
    assert(a168 - a24 > 0.3,
      s"and clearly beat the daily lag: 168=$a168 vs 24=$a24")
  }

  test("flat series reports NULL acf; missing hours densify as zeros") {
    val flat = ev((0L until 200L).map(h => (h, "flat", 5L)))
    val m = acfMap(flat)
    assert(Autocorr.Lags.forall(l => m(("flat", l))._2.isEmpty),
      "zero variance must yield NULL, not NaN")
    // a feed observed only on even hours: the odd hours are y=0 cells,
    // giving a strong period-2 alternation
    val sparse = ev((0L until 200L by 2).map(h => (h, "spike", 50L)))
    val s = acfMap(sparse)
    assert(s(("spike", 2L))._2.get > 0.9)
    assert(s(("spike", 1L))._2.get < -0.9)
  }

  test("one events fold: every downstream reference reads the checkpointed cells") {
    val feed = ev((0L until 200L).map(h => (h, "load", 10L)))
    val plan = Autocorr.autocorr(feed).queryExecution.executedPlan.toString
    // the barrier materialized: dev/den/num all scan the checkpoint RDD,
    // never re-deriving the events fold (the parquet-level twin is the
    // ExplainAudit <=1-events-scan invariant)
    assert(plan.contains("ExistingRDD"), plan)
  }
}
