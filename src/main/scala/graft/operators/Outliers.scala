package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-source outlier screening — the median/MAD modified
  * z-score (Iglewicz–Hoaglin, |z| > 3.5) over document token length.
  * Mean/stddev screens are themselves dragged by the outliers they
  * hunt; median and MAD have a 50% breakdown point, so one viral
  * megadoc cannot shift the gate for its whole source. Length is the
  * canonical target (truncated crawls and concatenated dumps are the
  * two most common corpus defects); the same shape applies to any
  * per-doc signal.
  *
  * Determinism: the median is the ELEMENT at rank ⌈n/2⌉ under
  * `(value, doc_id)` ordering (the `q_quantiles` convention — never
  * an interpolated average, so integer in, integer out), and MAD is
  * the same rank statistic over |x − med|. z is r6-rounded before
  * the 3.5 comparison, so the flag is bit-stable across engines.
  *
  * Scale: two per-source sort windows — exact order statistics, the
  * auditable form. Sources are low-cardinality, so each window is a
  * per-source sort; at 100 TB the same decision comes from the
  * mergeable [[QualitySketch]] histogram (±1-bin median/MAD) with
  * this exact form reserved for sampled audits — the
  * `q_quality_domain` / `q_quality_sketch` split, applied to robust
  * location/scale.
  */
object Outliers {

  /** Modified-z multiplier (Φ⁻¹(0.75) — MAD→σ consistency constant). */
  val MadConsistency = 0.6745

  /** Flag threshold on |modified z|. */
  val ZCut = 3.5

  /** Per-doc robust z over token length for any
    * `(doc_id, source, text)` frame: `(doc_id, source, n_tokens,
    * med, mad, z, is_outlier)`. `z` is null where MAD is 0 (a
    * degenerate source where over half the docs share one length —
    * no scale to score against).
    */
  def lengthOutliers(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(TextSim.tokens(col("text"))).cast("long").as("n_tokens"))
    val bySrc = Window.partitionBy(col("source"))
    val med = toks
      .withColumn("rn", row_number().over(
        bySrc.orderBy(col("n_tokens"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(bySrc))
      .groupBy(col("source"))
      .agg(max(when(col("rn") === ceil(col("cnt") * lit(0.5)),
        col("n_tokens"))).as("med"))
    val dev = toks.join(broadcast(med), "source")
      .withColumn("adev", abs(col("n_tokens") - col("med")))
    val mad = dev
      .withColumn("rn", row_number().over(
        bySrc.orderBy(col("adev"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(bySrc))
      .groupBy(col("source"))
      .agg(max(when(col("rn") === ceil(col("cnt") * lit(0.5)),
        col("adev"))).as("mad"))
    val z = TextSim.r6(
      (lit(MadConsistency) * (col("n_tokens") - col("med")).cast("double")) /
        col("mad").cast("double"))
    dev.join(broadcast(mad), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("med"), col("mad"),
        when(col("mad") > 0, z).as("z"),
        (col("mad") > 0 && abs(when(col("mad") > 0, z)) > ZCut)
          .as("is_outlier"))
  }

  /** q_outliers — [[lengthOutliers]] over `documents`. */
  def outliersQuery(s: SparkSession, d: String): DataFrame =
    lengthOutliers(Tables.documents(s, d)).orderBy(col("doc_id"))

  val outliersSql: String = {
    val zE = s"($MadConsistency * (n_tokens - med)::DOUBLE) / mad::DOUBLE"
    val zR = TextSim.r6Sql(zE)
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
       |  FROM documents
       |), r1 AS (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY source) AS cnt
       |  FROM t
       |), med AS (
       |  SELECT source, max(CASE WHEN rn = ceil(cnt * 0.5) THEN n_tokens END) AS med
       |  FROM r1 GROUP BY source
       |), d AS (
       |  SELECT t.*, m.med, abs(t.n_tokens - m.med) AS adev
       |  FROM t JOIN med m USING (source)
       |), r2 AS (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY adev, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY source) AS cnt
       |  FROM d
       |), mad AS (
       |  SELECT source, max(CASE WHEN rn = ceil(cnt * 0.5) THEN adev END) AS mad
       |  FROM r2 GROUP BY source
       |)
       |SELECT d.doc_id, d.source, d.n_tokens, d.med, m2.mad,
       |       CASE WHEN m2.mad > 0 THEN $zR END AS z,
       |       (m2.mad > 0 AND abs(CASE WHEN m2.mad > 0 THEN $zR END) > $ZCut) AS is_outlier
       |FROM d JOIN mad m2 USING (source)
       |ORDER BY doc_id""".stripMargin
  }
}
