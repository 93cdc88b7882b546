package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document TF-IDF keyword extraction — the document-side twin of
  * the per-domain profile ([[q_tfidf_domain]]): the top-k terms that
  * distinguish THIS document from the corpus. Standard uses in a
  * training-data pipeline: cheap topic tags for mix construction,
  * dedup-cluster naming, and retrieval-free routing of documents to
  * domain buckets.
  *
  * Scale shape: explode → partial-agg groupBy (doc, term) for tf
  * (map-side combine collapses repeated words before the shuffle);
  * df is a second partial-agg groupBy on term; the tf⋈df join keys on
  * term (vocab-sized side co-partitioned on its key — NOT broadcast:
  * vocabulary grows with the corpus); N rides a 1-row broadcast. The
  * final per-doc top-k is a window rank partitioned BY doc_id — a
  * keyed shuffle + in-partition sort bounded by per-doc vocab, the
  * same shape Spark picks for any grouped top-k; ranking on the
  * ROUNDED score (ties broken by term) keeps the cut deterministic
  * across engines.
  */
object Keywords {

  val TopK = 3

  /** Minimum term length — glue words carry no keyword signal and
    * cutting them bounds nothing (it's a per-row filter), it just
    * keeps the output honest.
    */
  val MinTermLen = 4

  /** `(doc_id, rk, term, tfidf)` — top-[[TopK]] terms per doc by
    * tf · ln(N/df), rank ties broken by term.
    */
  def keywords(docs: DataFrame): DataFrame = {
    val n = docs.agg(count(lit(1)).cast("long").as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(TextSim.tokens(col("text"))).as("term"))
      .filter(length(col("term")) >= MinTermLen)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        TextSim.r6(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("tfidf"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))).cast("long"))
      .filter(col("rk") <= TopK)
      .select(col("doc_id"), col("rk"), col("term"), col("tfidf"))
  }

  /** q_keywords — [[keywords]] over `documents`. */
  def keywordsQuery(s: SparkSession, d: String): DataFrame =
    keywords(Tables.documents(s, d)).orderBy(col("doc_id"), col("rk"))

  val keywordsSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, term, count(*)::BIGINT AS tf
       |  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
       |        FROM documents)
       |  WHERE length(term) >= $MinTermLen
       |  GROUP BY doc_id, term
       |), dfreq AS (
       |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
       |), n AS (
       |  SELECT count(*)::BIGINT AS n_docs FROM documents
       |), scored AS (
       |  SELECT doc_id, term,
       |         ${TextSim.r6Sql("tf::DOUBLE * ln(n_docs::DOUBLE / df::DOUBLE)")} AS tfidf
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
       |), ranked AS (
       |  SELECT doc_id, term, tfidf,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term)::BIGINT AS rk
       |  FROM scored
       |)
       |SELECT doc_id, rk, term, tfidf FROM ranked
       |WHERE rk <= $TopK
       |ORDER BY doc_id, rk""".stripMargin
}
