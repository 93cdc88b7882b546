package graft.operators

import graft.Tables
import graft.functions.{Heavy, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q_heavy_topk — the [[graft.functions.Heavy]] Misra–Gries summary
  * SERVED as a hash-checked census, closing the one sketch family
  * that had no oracle twin (HLL, KMV, CMS, QualitySketch all have
  * one). The sketch's counter BYTES are order-dependent in general
  * (two partitionings may store different counts — why Heavy was a
  * suite-tested artifact only), so the served query runs it in its
  * EXACT regime: capacity [[K]] at least the corpus vocabulary, where
  * Misra–Gries provably never decrements — per-partition folds hold
  * ≤ |vocab| ≤ k counters, merges union ≤ k counters — and the
  * summary equals the exact census regardless of partition count or
  * merge order. That is the closed form the oracle checks: estimate
  * = true count per term, counter sum = stream length, undercount
  * bound = 0. A vocabulary creeping past [[K]] would start
  * decrementing and fail the hash gate loudly (the documented
  * precondition is enforced, not assumed); the decrement-regime
  * bounds stay property-tested in HeavySpec.
  *
  * Scale: the sketch rides the token scan — O(k) memory per
  * partition, ≤ |partitions| k-pair summaries collected under the
  * bounded-statistic contract, zero shuffle. At 100 TB this is the
  * screen in front of exact vocabulary counting (`q_vocab` pays the
  * |vocab| shuffle; this pays none).
  *
  * Reference anchor: the reference counts per-run document/chunk
  * frequencies driver-side (Notion_openai_vector_etl.py:617-779);
  * this is that census as a mergeable bounded-memory artifact.
  */
object HeavyTopK {

  /** Sketch capacity — above the generator's fixed 31-word vocab at
    * every SF, so the summary is in the provably-exact regime.
    */
  val K = 64

  /** Census rows reported. */
  val TopN = 10

  def heavyTopK(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(TextSim.tokens(col("text"))).as("term"))
    val summary = Heavy.fit(toks, "term", K)
    val rows = summary.topK(TopN).zipWithIndex.map { case ((term, est), i) =>
      ((i + 1).toLong, term, est, summary.total, summary.counterSum,
        summary.maxUndercount)
    }
    import s.implicits._
    rows.toDF("rank", "term", "est", "n_total", "counter_sum",
      "max_undercount").orderBy(col("rank"))
  }

  /** Exact census mirror: in the exact regime the sketch's estimate
    * IS the true count, its counter sum IS the stream length, and its
    * undercount bound IS zero — all three asserted by the hash.
    */
  val heavyTopKSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY term
       |), tot AS (
       |  SELECT sum(c)::BIGINT AS n FROM tf
       |), ranked AS (
       |  SELECT term, c, row_number() OVER (ORDER BY c DESC, term) AS rank
       |  FROM tf
       |)
       |SELECT rank::BIGINT AS rank, term, c AS est, tot.n AS n_total,
       |       tot.n AS counter_sum, 0::BIGINT AS max_undercount
       |FROM ranked CROSS JOIN tot
       |WHERE rank <= $TopN
       |ORDER BY rank""".stripMargin
}
