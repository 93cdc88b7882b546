package graft.operators

import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Importance-weight health diagnostics — the report a pipeline reads
  * BEFORE trusting any weighted sampler ([[Corpus.sampleWeighted]],
  * [[Corpus.sampleTopW]], DSIR resampling): Kish effective sample
  * size ESS = (Σw)²/Σw² (Kish 1965 — how many EQUAL-weight draws the
  * weighted scheme is worth; ESS ≪ n means a few heavy docs dominate
  * and the sample's variance explodes), the ESS fraction, the single
  * heaviest doc's mass share, and the share held by the top 100
  * weights (the concentration tail a max alone cannot see).
  *
  * Weights are the proven engine-identical r6 quality composite
  * ([[TextAnalysis.qualityScores]]). Determinism: Σw and Σw² fold in
  * DECIMAL (order-free exact — w rides decimal(18,6), w² its exact
  * decimal(37,12) product; a double Σ would hash-flake, the dsum
  * rule); the three ratios run in double on identical exact inputs,
  * r6. Degenerate total (Σw² = 0) reports NULLs.
  *
  * Scale: one corpus scan folds n/Σw/Σw²/max (partial-agg); the
  * top-100 mass is a TakeOrdered partial top-N (never a global
  * sort) over the same scan's projection — the q_sample_topw shape.
  */
object Ess {

  /** Concentration-tail size. */
  val TopK = 100

  def essQuery(s: SparkSession, d: String): DataFrame =
    ess(TextAnalysis.qualityScores(s, d).select(col("doc_id"), col("quality")))

  /** Diagnostics over any (doc_id, quality-weight) frame. */
  def ess(q: DataFrame): DataFrame = {
    val wd = col("quality").cast("decimal(18,6)")
    val moments = q.agg(
      count(lit(1)).cast("long").as("n"),
      sum(wd).cast("double").as("sw"),
      sum(wd * wd).cast("double").as("sww"),
      max(col("quality")).as("wmax"))
    val top = q.orderBy(col("quality").desc, col("doc_id")).limit(TopK)
      .agg(TextSim.dsum(col("quality")).as("swtop"))
    val ok = col("sww") > 0d
    moments.crossJoin(broadcast(top))
      .select(col("n"),
        TextSim.r6(col("sw")).as("sum_w"),
        when(ok, TextSim.r6(col("sw") * col("sw") / col("sww"))).as("ess"),
        when(ok, TextSim.r6(col("sw") * col("sw") / col("sww") / col("n")))
          .as("ess_frac"),
        when(ok, TextSim.r6(col("wmax") / col("sw"))).as("max_share"),
        when(ok, TextSim.r6(col("swtop") / col("sw"))).as("topk_share"))
  }

  val essSql: String =
    s"""WITH ${TextAnalysis.qualityScoreCtesSql("documents")},
       |q AS (SELECT doc_id, quality FROM q_scores),
       |m AS (
       |  SELECT count(*)::BIGINT AS n,
       |         sum(quality::DECIMAL(18,6))::DOUBLE AS sw,
       |         sum(quality::DECIMAL(18,6) * quality::DECIMAL(18,6))::DOUBLE AS sww,
       |         max(quality) AS wmax
       |  FROM q
       |), top AS (
       |  SELECT ${TextSim.dsumSql("quality")} AS swtop
       |  FROM (SELECT quality FROM q ORDER BY quality DESC, doc_id LIMIT $TopK)
       |)
       |SELECT n, ${TextSim.r6Sql("sw")} AS sum_w,
       |       CASE WHEN sww > 0 THEN ${TextSim.r6Sql("sw * sw / sww")} END AS ess,
       |       CASE WHEN sww > 0 THEN
       |         ${TextSim.r6Sql("sw * sw / sww / n::DOUBLE")} END AS ess_frac,
       |       CASE WHEN sww > 0 THEN ${TextSim.r6Sql("wmax / sw")} END AS max_share,
       |       CASE WHEN sww > 0 THEN ${TextSim.r6Sql("swtop / sw")} END AS topk_share
       |FROM m CROSS JOIN top""".stripMargin
}
