package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-domain adaptive quality filtering on the ingest stream — the
  * continuous consumer of `q_quality_domain`'s calibration, completing
  * the loop `q_filter_domain` closes in batch: each streamed document
  * is kept against its OWN source's median-quality threshold instead
  * of the global 0.5 cutoff.
  *
  * Production shape: calibration is a slowly-changing, ≤|domains|-row
  * table recomputed offline ([[TextAnalysis.domainThresholds]] over
  * yesterday's corpus) while the stream applies it per row — a
  * STREAM-STATIC broadcast join, which Structured Streaming executes
  * with zero state store, no watermark, and append-mode semantics.
  * The quality signals themselves ([[TextAnalysis.filterSignals]]) are
  * one fused per-row projection, so the whole operator is stateless
  * and scales with partition count alone. Sources never seen during
  * calibration (a NEW domain appearing mid-stream) fall back to the
  * global 0.5 cutoff until the next calibration refresh picks them up.
  *
  * Mirrors the reference's freshness contract (re-process decisions
  * made against stored state, Notion_openai_vector_etl.py:678-739):
  * the stored artifact here is the calibration table, not the corpus.
  */
object StreamingFilterDomain {

  val GlobalCutoff: Double = 0.5

  /** `docs` is a STREAMING frame `(doc_id, source, text)`; `thresholds`
    * is a STATIC `(source, q50)` calibration table (from
    * [[TextAnalysis.domainThresholds]], typically read back from
    * storage). Emits `(doc_id, source, quality, q50, keep)` — the same
    * schema and decision rule as batch `q_filter_domain`.
    */
  def apply(docs: DataFrame, thresholds: DataFrame): DataFrame =
    TextAnalysis.filterSignals(
      docs.select(col("doc_id"), col("source"), col("text")),
      passthrough = Seq("source"))
      .join(broadcast(thresholds), Seq("source"), "left")
      .withColumn("q50", coalesce(col("q50"), lit(GlobalCutoff)))
      .select(col("doc_id"), col("source"), col("quality"), col("q50"),
        (col("quality") >= col("q50") && col("is_en") &&
          col("dup_fraction") <= 0.2).as("keep"))
}
