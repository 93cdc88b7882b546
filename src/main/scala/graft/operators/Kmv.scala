package graft.operators

import graft.Tables
import graft.functions.{BottomKByHash, HashedVal, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) quantile sketch — mergeable rank statistics
  * with NO prior value range. [[QualitySketch]]'s fixed-grid
  * histogram needs a bounded domain ([0,1] quality); arbitrary
  * metrics (latencies, doc lengths, scores) have none, and the exact
  * order-statistic path (`q_quantiles`) is a full per-key sort — at
  * 100 TB a nightly quantile refresh cannot rescan the corpus. The
  * KMV sketch keeps, per key, the k rows with the smallest md5 rank
  * hash: a uniform value-independent sample whose sorted values
  * estimate any quantile with O(1/√k) rank error.
  *
  * Why KMV over a KLL/GK compactor sketch (deliberate trade): KLL's
  * error for the same space is tighter, but its compactions depend on
  * arrival order — results vary run to run and can't be
  * hash-verified. Bottom-k-of-a-total-order is DETERMINISTIC in the
  * data (any partitioning, any merge order — byte-identical state),
  * duplicate-blind under replay, and exactly mirrorable in SQL, which
  * buys oracle verification and idempotent incremental refresh. Same
  * discipline as [[Hll]]'s register table: the sketch IS a small
  * frame, stored per slice and merged at read time.
  *
  * Scale shape: sketching is one ObjectHashAggregate with map-side
  * partial top-k (≤ k rows per key per partition cross the wire);
  * merge = union + the same aggregate over ≤ 2k rows per key;
  * quantile reads are windows over ≤ k-row frames.
  */
object Kmv {

  /** Sample size per key: 128 → ~4–5% σ rank error at the median. */
  val K = 128

  /** Rank hash: md5 over `key|id` — value-independent (hashing the
    * VALUE would bias the sample under duplicate values).
    */
  private def rankHash(key: org.apache.spark.sql.Column,
    id: org.apache.spark.sql.Column) =
    md5(concat_ws("|", key, id.cast("string")))

  /** Per-key KMV sketch rows `(key, h, v)` (≤ k per key) of any
    * frame's `(keyCol, idCol, valCol)`.
    */
  def sketch(df: DataFrame, keyCol: String, idCol: String, valCol: String,
    k: Int = K): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val agg = new BottomKByHash(k)
    df.select(col(keyCol).cast("string").as("key"),
      rankHash(col(keyCol).cast("string"), col(idCol)).as("h"),
      col(valCol).cast("double").as("v"))
      .as[HashedVal]
      .groupByKey(_.key)
      .agg(agg.toColumn.name("kept"))
      .toDF("key", "kept")
      .select(col("key"), explode(col("kept")).as("kv"))
      .select(col("key"), col("kv.h").as("h"), col("kv.v").as("v"))
  }

  /** Merge sketch frames: union + re-cut to the k smallest hashes per
    * key — byte-identical to sketching the concatenated input.
    */
  def merge(a: DataFrame, b: DataFrame, k: Int = K): DataFrame = {
    val s = a.sparkSession
    import s.implicits._
    val agg = new BottomKByHash(k)
    a.unionByName(b)
      .select(col("key"), col("h"), col("v"))
      .as[HashedVal]
      .groupByKey(_.key)
      .agg(agg.toColumn.name("kept"))
      .toDF("key", "kept")
      .select(col("key"), explode(col("kept")).as("kv"))
      .select(col("key"), col("kv.h").as("h"), col("kv.v").as("v"))
  }

  /** Quantile estimates off a sketch: per key, the sample value at
    * rank ⌈m·p⌉ under (v, h) order — deterministic tie-break, window
    * over ≤ k rows.
    */
  def quantiles(sk: DataFrame, ps: Seq[(String, Double)]): DataFrame = {
    val byKey = Window.partitionBy(col("key"))
    val ranked = sk
      .withColumn("rv", row_number().over(byKey.orderBy(col("v"), col("h"))))
      .withColumn("m", count(lit(1)).over(byKey))
    val aggs = ps.map { case (name, p) =>
      TextSim.r6(max(when(col("rv") === ceil(col("m") * lit(p)), col("v"))))
        .as(name)
    }
    ranked.groupBy(col("key"))
      .agg(max(col("m")).cast("long").as("n_sample"), aggs: _*)
  }

  /** q_kmv_quantiles — per-event-type p10/p50/p90 read from a k=128
    * KMV sketch of `events.value` (the sketch-path counterpart of the
    * exact `q_quantiles`).
    */
  def kmvQuantiles(s: SparkSession, d: String): DataFrame =
    quantiles(
      sketch(Tables.events(s, d), "event_type", "event_id", "value"),
      Seq(("p10", 0.1), ("p50", 0.5), ("p90", 0.9)))
      .withColumnRenamed("key", "event_type")
      .orderBy(col("event_type"))

  val kmvQuantilesSql: String =
    s"""WITH hashed AS (
       |  SELECT event_type AS key,
       |         md5(event_type || '|' || event_id::VARCHAR) AS h,
       |         value::DOUBLE AS v
       |  FROM events
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY h) AS rh
       |  FROM hashed
       |), kept AS (
       |  SELECT key, h, v FROM ranked WHERE rh <= $K
       |), r2 AS (
       |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY v, h) AS rv,
       |         count(*) OVER (PARTITION BY key) AS m
       |  FROM kept
       |)
       |SELECT key AS event_type,
       |       max(m)::BIGINT AS n_sample,
       |       ${TextSim.r6Sql("max(CASE WHEN rv = ceil(m * 0.1) THEN v END)")} AS p10,
       |       ${TextSim.r6Sql("max(CASE WHEN rv = ceil(m * 0.5) THEN v END)")} AS p50,
       |       ${TextSim.r6Sql("max(CASE WHEN rv = ceil(m * 0.9) THEN v END)")} AS p90
       |FROM r2
       |GROUP BY key
       |ORDER BY event_type""".stripMargin
}
