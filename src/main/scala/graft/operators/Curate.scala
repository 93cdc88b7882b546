package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The END-TO-END curation chain as one oracle-checked operator —
  * exact dedup → fused quality filter → sequence packing, composed the
  * way a production run composes them (PipelineSpec proves the
  * ordering theorem library-side; this makes the full chain a single
  * DuckDB-hash-verified query, so a regression ANYWHERE in the
  * pipeline — a hash change, a filter-threshold drift, a packing
  * boundary — fails the round gate, not just a unit test).
  *
  * Reference hook: this IS the reference's `run_etl` loop
  * (Notion_openai_vector_etl.py:369-417 — skip unchanged, transform,
  * batch) re-expressed as corpus curation: skip-duplicates, keep-good,
  * bin-for-training.
  *
  * Scale shape, stage by stage: dedup is ONE shuffle on content_hash
  * (min-keeper groupBy + co-partitioned member re-join —
  * [[Dedup.exactKeepRows]]'s viral-safe form); the signal battery and
  * keep decision ride the post-dedup scan ([[TextAnalysis
  * .filterSignals]], a pure projection); packing is ONE window shuffle
  * on source ([[Corpus.pack]]'s prefix-sum binning). The corpus never
  * shuffles on doc_id, and no stage joins the output of another by id
  * — each consumes the previous frame in place.
  */
object Curate {

  /** Curate any `(doc_id, source, text)` frame: drop exact duplicates
    * (keep lowest doc_id), keep docs passing the fused quality filter,
    * pack survivors into per-source ≤[[Corpus.SeqTokens]] training
    * sequences. Returns `(doc_id, source, n_tokens, quality, seq_id)`.
    */
  def curate(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("doc_id"), col("source"), col("text"))
      .withColumn("content_hash", md5(col("text")))
    val keepers = hashed.groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"))
    val deduped = hashed.join(keepers, "content_hash")
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("n_tokens",
        size(TextSim.tokens(col("text"))).cast("long"))
    // Barrier: the packing window's sort requirement would otherwise
    // push the keep filter THROUGH the signals projection, substituting
    // the whole battery into an interpreted pre-exchange predicate and
    // re-evaluating it per reference (the q_filter_domain persist
    // precedent; measured 5.4 s → 1.2 s at sf0.1). The persisted frame
    // is the NARROW signal projection, not the corpus text.
    val sig = TextAnalysis.filterSignals(deduped,
      passthrough = Seq("source", "n_tokens")).persist()
    val kept = sig.filter(col("keep"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    kept
      .withColumn("seq_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) /
          Corpus.SeqTokens))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("quality"), col("seq_id"))
  }

  /** q_curate — [[curate]] over the corpus with injected exact
    * duplicates (every doc_id % 10 = 0 doc has a same-source copy), so
    * the dedup stage demonstrably fires before filter and pack.
    */
  def curateQuery(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
    val aug = base.unionAll(
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
          col("text")))
    curate(aug).orderBy(col("source"), col("doc_id"))
  }

  val curateSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, source, text FROM documents
       |  WHERE doc_id % 10 = 0
       |), hashed AS (
       |  SELECT doc_id, source, text, md5(text) AS content_hash FROM aug
       |), keepers AS (
       |  SELECT content_hash, min(doc_id) AS keep_id
       |  FROM hashed GROUP BY content_hash
       |), deduped AS (
       |  SELECT h.doc_id, h.source, h.text,
       |         len(list_filter(string_split(h.text, ' '), x -> x <> ''))::BIGINT
       |           AS n_tokens
       |  FROM hashed h
       |  JOIN keepers k ON k.content_hash = h.content_hash
       |                AND h.doc_id = k.keep_id
       |), ${TextAnalysis.signalsSqlCteFor(", source, n_tokens", "deduped")},
       |kept AS (
       |  SELECT doc_id, source, n_tokens, quality FROM scored
       |  WHERE quality >= 0.5 AND is_en AND dup_fraction <= 0.2
       |)
       |SELECT doc_id, source, n_tokens, quality,
       |       floor(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |             / ${Corpus.SeqTokens})::BIGINT AS seq_id
       |FROM kept
       |ORDER BY source, doc_id""".stripMargin
}
