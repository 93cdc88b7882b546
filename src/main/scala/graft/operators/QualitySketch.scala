package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable per-domain quality-quantile sketches — the INCREMENTAL
  * form of `q_quality_domain`'s calibration: the exact ranked-window
  * order statistic rescans the whole corpus per refresh, which at
  * 100 TB turns a nightly calibration into a full-corpus shuffle.
  * The sketch makes refresh O(new batch) instead: quality is bounded
  * in [0, 1] BY CONSTRUCTION (a convex combination of [0, 1] terms —
  * `TextAnalysis.filterSignals`), so a fixed-grid histogram of
  * [[Bins]] buckets is a lossless-to-merge, bounded-error quantile
  * summary. Counts add, so sketches merge by union + sum — the same
  * associative-state contract as `SignatureStore.incrementalPairs` and
  * `Components.mergePairs`, applied to calibration: sketch each ingest
  * batch, merge into the stored sketch, re-derive thresholds from the
  * ≤|domains|·[[Bins]]-row sketch without touching old documents.
  *
  * Error: a quantile read from the sketch is off by at most one bin
  * width (1/[[Bins]] in quality units) from the exact order statistic
  * — calibration cutoffs are heuristics with far larger intrinsic
  * noise, and the bound is asserted in QualitySketchSpec.
  *
  * Scale shape: sketching is one map-side-combined groupBy on
  * (source, bin); merge and threshold extraction run on frames of at
  * most |domains|·[[Bins]] rows — driver-broadcastable, never
  * corpus-sized.
  */
object QualitySketch {

  /** Quality-axis resolution. 256 bins → ≤ 0.4% quantile error, and a
    * full sketch for 1000 domains is ~256 k rows — still a broadcast.
    */
  val Bins = 256

  /** Sketch a [[TextAnalysis.filterSignals]] frame (needs `source`
    * passthrough) into `(source, bin, cnt)` rows.
    */
  def fromSignals(sig: DataFrame): DataFrame =
    sig.select(col("source"),
      least(floor(col("quality") * Bins), lit(Bins - 1)).cast("int").as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches (any number of batches, any order — counts add). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("source"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-domain quantile-`p` threshold read from a sketch:
    * `(source, q50)` with the estimate at the crossing bin's midpoint
    * — within one bin width of the exact ranked-window statistic.
    * Column named `q50` so the frame drops straight into
    * [[graft.streaming.StreamingFilterDomain]] (or the batch
    * [[TextAnalysis.filterDomain]] decision rule) as the calibration
    * table.
    */
  def threshold(sketch: DataFrame, p: Double = 0.5): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("bin"))
    sketch
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("source"))))
      .filter(col("cum") >= ceil(col("n") * p))
      .groupBy(col("source"))
      .agg(min(col("bin")).as("qbin"))
      .select(col("source"), ((col("qbin") + 0.5) / Bins).as("q50"))
  }

  /** q_quality_sketch — the sketch-derived per-domain calibration as a
    * query: bin counts → crossing-bin median estimate. All arithmetic
    * is binary-exact on both engines (r6-rounded quality, power-of-two
    * bin width), so the DuckDB mirror hash-matches bit for bit.
    */
  def qualitySketch(s: SparkSession, d: String): DataFrame =
    threshold(fromSignals(TextAnalysis.filterSignals(
      Tables.documents(s, d).select(col("doc_id"), col("source"), col("text")),
      passthrough = Seq("source"))))
      .orderBy(col("source"))

  val qualitySketchSql: String =
    s"""WITH ${TextAnalysis.signalsSqlCteFor(", source")},
       |binned AS (
       |  SELECT source, least(floor(quality * $Bins), ${Bins - 1})::INT AS bin,
       |         count(*)::BIGINT AS cnt
       |  FROM scored GROUP BY source, bin
       |), cum AS (
       |  SELECT source, bin,
       |         sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
       |         sum(cnt) OVER (PARTITION BY source) AS n
       |  FROM binned
       |)
       |SELECT source, (min(bin) + 0.5) / $Bins AS q50
       |FROM cum WHERE cum >= ceil(n * 0.5)
       |GROUP BY source
       |ORDER BY source""".stripMargin
}
