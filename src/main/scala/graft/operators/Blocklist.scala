package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Term-blocklist screening — the C4 "bad words" gate (Raffel et al.
  * 2020 drop any document containing a listed term) plus the softer
  * rate-thresholded variant (a stray quoted word shouldn't kill an
  * otherwise-clean document; RefinedWeb-style pipelines threshold on
  * the hit RATE instead). The reference pipeline has no content gate
  * at all — anything extracted is uploaded
  * (Notion_openai_vector_etl.py:304-344); a training-data engine needs
  * the screen in front of the corpus, and it must explain itself
  * (WHICH terms, how often — the q_gopher per-rule reporting rule).
  *
  * Scale shape: a pure per-row projection riding the scan — the
  * blocklist is a bounded literal the comparison fold carries, so the
  * corpus never shuffles and the operator pipelines into whatever
  * stage follows (the q_filter fusion discipline). Real-world lists
  * (hundreds to a few thousand terms) stay comfortably inside a
  * constant-folded literal array; for a blocklist too large to carry
  * per-comparison (millions of entries — URL blocklists), the
  * [[graft.functions.Bloom]] screen is the house path: probe a bits
  * artifact per token, exact-verify only flagged docs
  * ([[Corpus.contaminationBloom]] is the same composition).
  */
object Blocklist {

  /** Fixture blocklist: mid-frequency corpus terms, so both gates
    * discriminate (19/500 strict-clean at sf0.01, hit rates 0–0.24).
    */
  val Terms: Seq[String] = Seq("big", "slow", "vector")

  /** Soft-gate ceiling on the blocked-token fraction. */
  val SoftMax = 0.12

  /** Per-doc screen over a caller frame: occurrence and distinct-term
    * counts, blocked fraction, and both keep decisions.
    */
  def screen(docs: DataFrame, idCol: String, textCol: String,
    terms: Seq[String] = Terms, softMax: Double = SoftMax): DataFrame = {
    val bl: Column = array(terms.map(lit): _*)
    docs
      .select(col(idCol), TextSim.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col(idCol),
        size(col("t")).cast("long").as("n_tokens"),
        size(filter(col("t"), x => array_contains(bl, x)))
          .cast("long").as("n_hits"),
        size(array_intersect(array_distinct(col("t")), bl))
          .cast("long").as("n_terms"))
      .withColumn("hit_frac",
        TextSim.r6(col("n_hits").cast("double") / col("n_tokens")))
      .withColumn("keep_strict", col("n_hits") === 0)
      // threshold the ROUNDED rate — engine-identical decision
      .withColumn("keep_soft", col("hit_frac") <= softMax)
  }

  /** q_blocklist — the screen over the documents corpus. */
  def blocklist(s: SparkSession, d: String): DataFrame =
    screen(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  val blocklistSql: String = {
    val lit = Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents
       |), counted AS (
       |  SELECT doc_id,
       |         len(t)::BIGINT AS n_tokens,
       |         len(list_filter(t, x -> list_contains([$lit], x)))::BIGINT AS n_hits,
       |         len(list_intersect(list_distinct(t), [$lit]))::BIGINT AS n_terms
       |  FROM toks WHERE len(t) >= 1
       |)
       |SELECT doc_id, n_tokens, n_hits, n_terms,
       |       ${TextSim.r6Sql("n_hits::DOUBLE / n_tokens::DOUBLE")} AS hit_frac,
       |       (n_hits = 0) AS keep_strict,
       |       (${TextSim.r6Sql("n_hits::DOUBLE / n_tokens::DOUBLE")} <= $SoftMax) AS keep_soft
       |FROM counted
       |ORDER BY doc_id""".stripMargin
  }
}
