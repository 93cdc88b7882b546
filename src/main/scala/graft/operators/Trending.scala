package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decayed trending-term report — corpus drift monitoring at term
  * granularity (the vocabulary-level complement of [[CorpusStats]]'s
  * bucket-level `q_drift`): which terms are GAINING, weighted toward
  * the newest crawl days, so a burst last night outranks a steady
  * hum. Exponential decay is the standard freshness kernel, and the
  * classic implementation (`pow(lambda, age)` doubles) is
  * libm-dependent and hash-unverifiable; with a half-per-day rate the
  * weights are POWERS OF TWO, so the decayed score
  * Σ_d count_d · 2^d is exact integer arithmetic — engine-identical,
  * order-free, and still a true exponential decay.
  *
  * Scale shape: one explode + (term, day) partial-agg groupBy over
  * the corpus, then the decay fold and top-k run on the ≤|vocab|·days
  * aggregated frame; the head is a TakeOrdered partial top-k (the
  * `q_vocab` discipline) under a total order (score desc, term) — no
  * LIMIT without total order.
  */
object Trending {

  val Days = 7
  val TopK = 20

  /** q_trending — the report over the documents corpus, crawl day
    * derived as doc_id mod [[Days]] (the deterministic fixture
    * timeline; production passes a real ingest-day column).
    */
  def trending(s: SparkSession, d: String): DataFrame =
    report(Tables.documents(s, d)
      .select((col("doc_id") % Days).cast("int").as("day"),
        TextSim.tokens(col("text")).as("t")))

  /** The report over a (day, t: array<string>) frame. */
  def report(docs: DataFrame): DataFrame = {
    val termDay = docs
      .select(col("day"), explode(col("t")).as("term"))
      .groupBy(col("term"), col("day"))
      .agg(count(lit(1)).as("c"))
    termDay.groupBy(col("term"))
      .agg(
        // SQL-form shiftleft: the Scala helper only takes a literal
        // shift, the day column needs the expression form
        sum(expr("c * shiftleft(CAST(1 AS BIGINT), day)")).as("score"),
        sum(when(col("day") >= Days - 2, col("c")).otherwise(0L))
          .as("n_recent"),
        sum(col("c")).as("n_total"))
      .orderBy(col("score").desc, col("term"))
      .limit(TopK)
  }

  val trendingSql: String =
    s"""WITH toks AS (
       |  SELECT (doc_id % $Days)::INT AS day,
       |         list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents
       |), expanded AS (
       |  SELECT unnest(t) AS term, day FROM toks
       |), term_day AS (
       |  SELECT term, day, count(*)::BIGINT AS c
       |  FROM expanded GROUP BY term, day
       |)
       |SELECT term,
       |       sum(c * (1::BIGINT << day))::BIGINT AS score,
       |       sum(CASE WHEN day >= ${Days - 2} THEN c ELSE 0 END)::BIGINT AS n_recent,
       |       sum(c)::BIGINT AS n_total
       |FROM term_day
       |GROUP BY term
       |ORDER BY score DESC, term
       |LIMIT $TopK""".stripMargin
}
