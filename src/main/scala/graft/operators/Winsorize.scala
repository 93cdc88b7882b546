package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group statistics: 10%-trimmed and winsorized means next
  * to the raw mean (Tukey's robust-estimation staples) — the
  * heavy-tail answer of the metric family: `q_anomaly` z-scores
  * assume the mean/std are trustworthy, `q_outliers` flags the tails,
  * this pair of estimators reports what the CENTER looks like once
  * the tails can't vote: winsorize clamps the outer deciles to the
  * decile boundary values (keeps n, caps influence), trimming drops
  * them (changes n, zero influence). mean ≫ trimmed = the metric is
  * carried by its tail — the exact situation where a raw-mean SLA or
  * experiment readout lies.
  *
  * Determinism: values fix to integer cents; ranks are row_number
  * with event_id tiebreak (total order); the clamp bounds are EXACT
  * order statistics (the values at ranks k+1 and n−k, k = ⌊n/10⌋);
  * all three sums fold as BIGINTs; three r6 divisions. Small groups
  * (k = 0) degenerate to all three means equal — asserted, not
  * special-cased.
  *
  * Scale shape: the rank window partitions by event_type (the
  * q_quantiles exact-audit shape; the rescan-free 100 TB path reads
  * bounds off [[Kmv]] sketches and clamps in one pass); the bounds
  * frame is ≤|types| rows broadcast back; one partial-agg fold ends
  * it.
  */
object Winsorize {

  /** Trim fraction denominator (10%). */
  val TrimDen = 10L

  def winsorizeQuery(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("event_id"))
    val ranked = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("v"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("k", expr(s"n div $TrimDen"))
    val bounds = ranked
      .filter(col("rn") === col("k") + 1L || col("rn") === col("n") - col("k"))
      .groupBy(col("event_type"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    ranked.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        sum(col("v")).as("s_raw"),
        sum(greatest(least(col("v"), col("hi")), col("lo"))).as("s_win"),
        sum(when(col("rn") > col("k") && col("rn") <= col("n") - col("k"),
          col("v")).otherwise(lit(0L))).as("s_trim"))
      .select(col("event_type"), col("n"),
        TextSim.r6(col("lo").cast("double") / 100.0).as("lo"),
        TextSim.r6(col("hi").cast("double") / 100.0).as("hi"),
        TextSim.r6(col("s_raw").cast("double") /
          (col("n").cast("double") * 100.0)).as("mean"),
        TextSim.r6(col("s_win").cast("double") /
          (col("n").cast("double") * 100.0)).as("winsor_mean"),
        TextSim.r6(col("s_trim").cast("double") /
          ((col("n") - col("k") * 2L).cast("double") * 100.0)).as("trimmed_mean"))
      .orderBy(col("event_type"))
  }

  /** Clamp bounds read off a [[Kmv]] sketch frame `(key, h, v)` of
    * CENTS values: the sample value at rank ⌈m/TrimDen⌉ (lo) and
    * ⌈m·(TrimDen−1)/TrimDen⌉ (hi) under the sketch's deterministic
    * (v, h) order — ≤ k-row windows, O(1/√k) rank error.
    */
  private[graft] def servedBounds(sk: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("key"))
    sk.withColumn("rv", row_number().over(byKey.orderBy(col("v"), col("h"))))
      .withColumn("m", count(lit(1)).over(byKey))
      .groupBy(col("key"))
      .agg(max(col("m")).cast("long").as("n_sample"),
        max(when(col("rv") === ceil(col("m") * lit(1.0 / TrimDen)), col("v")))
          .cast("long").as("lo"),
        max(when(col("rv") === ceil(col("m") * lit(1.0 - 1.0 / TrimDen)),
          col("v"))).cast("long").as("hi"))
  }

  /** The ONE-corpus-pass serve: clamp against sketch-read bounds and
    * fold — no rank window, no per-key sort, the corpus touched once
    * (WinsorizeServedSpec asserts the single scan against a
    * materialized sketch). No trimmed mean here, deliberately:
    * trimming needs exact membership of the dropped set (a rank per
    * ROW), which is precisely what a rescan-free path cannot know;
    * the winsorized clamp needs only the two BOUNDS — exactly what a
    * sketch serves. That asymmetry is why the winsorized mean, not
    * the trimmed mean, is the robust-center statistic that survives
    * the 100 TB regime.
    */
  def winsorizeServedFrom(ev: DataFrame, sk: DataFrame): DataFrame =
    ev.join(broadcast(servedBounds(sk)),
      col("key") === col("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        max(col("n_sample")).as("n_sample"),
        max(col("lo")).as("loC"), max(col("hi")).as("hiC"),
        sum(col("vc")).as("s_raw"),
        sum(greatest(least(col("vc"), col("hi")), col("lo"))).as("s_win"))
      .select(col("event_type"), col("n"), col("n_sample"),
        TextSim.r6(col("loC").cast("double") / 100.0).as("lo"),
        TextSim.r6(col("hiC").cast("double") / 100.0).as("hi"),
        TextSim.r6(col("s_raw").cast("double") /
          (col("n").cast("double") * 100.0)).as("mean"),
        TextSim.r6(col("s_win").cast("double") /
          (col("n").cast("double") * 100.0)).as("winsor_mean"))

  /** q_winsorize_kmv — the promised rescan-free twin of
    * `q_winsorize`: bounds estimated from the k=128 [[Kmv]] bottom-k
    * sample (p10/p90 by rank, the sketch the nightly refresh
    * maintains incrementally), broadcast, clamped in one fold. In
    * production the sketch pre-exists ([[winsorizeServedFrom]] is the
    * one-scan path); the QUERY builds it in-line so the oracle can
    * mirror the full lineage. WinsorizeServedSpec cross-validates
    * against the exact form: served bounds rank-bracketed by exact
    * p5/p15 and p85/p95 order statistics, served winsorized mean
    * inside the exact means computed at those bracket bounds
    * (monotonicity of the clamp makes that a true envelope — the
    * q_lift/Audience cross-validation discipline).
    */
  def winsorizeServed(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("vc"))
    val sk = Kmv.sketch(ev, "event_type", "event_id", "vc")
    winsorizeServedFrom(ev, sk).orderBy(col("event_type"))
  }

  val winsorizeServedSql: String =
    s"""WITH hashed AS (
       |  SELECT event_type AS key,
       |         md5(event_type || '|' || event_id::VARCHAR) AS h,
       |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
       |  FROM events WHERE value IS NOT NULL
       |), rankedh AS (
       |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY h) AS rh
       |  FROM hashed
       |), kept AS (
       |  SELECT key, h, vc FROM rankedh WHERE rh <= ${Kmv.K}
       |), r2 AS (
       |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY vc, h) AS rv,
       |         count(*) OVER (PARTITION BY key) AS m
       |  FROM kept
       |), bounds AS (
       |  SELECT key, max(m)::BIGINT AS n_sample,
       |         max(CASE WHEN rv = ceil(m * ${1.0 / TrimDen}) THEN vc END)::BIGINT AS lo,
       |         max(CASE WHEN rv = ceil(m * ${1.0 - 1.0 / TrimDen}) THEN vc END)::BIGINT AS hi
       |  FROM r2 GROUP BY key
       |), agg AS (
       |  SELECT e.event_type, count(*)::BIGINT AS n,
       |         max(b.n_sample)::BIGINT AS n_sample,
       |         max(b.lo)::BIGINT AS lo, max(b.hi)::BIGINT AS hi,
       |         sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT))::BIGINT AS s_raw,
       |         sum(greatest(least(CAST(floor(e.value * 100 + 0.5) AS BIGINT),
       |                            b.hi), b.lo))::BIGINT AS s_win
       |  FROM events e JOIN bounds b ON b.key = e.event_type
       |  WHERE e.value IS NOT NULL
       |  GROUP BY e.event_type
       |)
       |SELECT event_type, n, n_sample,
       |       ${TextSim.r6Sql("lo::DOUBLE / 100.0")} AS lo,
       |       ${TextSim.r6Sql("hi::DOUBLE / 100.0")} AS hi,
       |       ${TextSim.r6Sql("s_raw::DOUBLE / (n::DOUBLE * 100.0)")} AS mean,
       |       ${TextSim.r6Sql("s_win::DOUBLE / (n::DOUBLE * 100.0)")} AS winsor_mean
       |FROM agg
       |ORDER BY event_type""".stripMargin

  val winsorizeSql: String =
    s"""WITH ranked AS (
       |  SELECT event_type, event_id,
       |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT), event_id)::BIGINT AS rn,
       |         count(*) OVER (PARTITION BY event_type)::BIGINT AS n
       |  FROM events WHERE value IS NOT NULL
       |), kd AS (
       |  SELECT *, n // $TrimDen AS k FROM ranked
       |), bounds AS (
       |  SELECT event_type, min(v)::BIGINT AS lo, max(v)::BIGINT AS hi
       |  FROM kd WHERE rn = k + 1 OR rn = n - k
       |  GROUP BY event_type
       |), agg AS (
       |  SELECT kd.event_type, max(n)::BIGINT AS n, max(k)::BIGINT AS k,
       |         max(lo)::BIGINT AS lo, max(hi)::BIGINT AS hi,
       |         sum(v)::BIGINT AS s_raw,
       |         sum(greatest(least(v, hi), lo))::BIGINT AS s_win,
       |         sum(CASE WHEN rn > k AND rn <= n - k THEN v ELSE 0 END)::BIGINT AS s_trim
       |  FROM kd JOIN bounds ON bounds.event_type = kd.event_type
       |  GROUP BY kd.event_type
       |)
       |SELECT event_type, n,
       |       ${TextSim.r6Sql("lo::DOUBLE / 100.0")} AS lo,
       |       ${TextSim.r6Sql("hi::DOUBLE / 100.0")} AS hi,
       |       ${TextSim.r6Sql("s_raw::DOUBLE / (n::DOUBLE * 100.0)")} AS mean,
       |       ${TextSim.r6Sql("s_win::DOUBLE / (n::DOUBLE * 100.0)")} AS winsor_mean,
       |       ${TextSim.r6Sql("s_trim::DOUBLE / ((n - 2 * k)::DOUBLE * 100.0)")} AS trimmed_mean
       |FROM agg
       |ORDER BY event_type""".stripMargin
}
