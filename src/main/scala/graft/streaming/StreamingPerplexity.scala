package graft.streaming

import graft.operators.Perplexity
import org.apache.spark.sql.DataFrame

/** Perplexity scoring on the ingest stream — the continuous form of
  * [[graft.operators.Perplexity]]: every arriving document is scored
  * against the reference LM BEFORE it enters the corpus, so the
  * fluency screen (drop the high-perplexity tail) runs at the door.
  *
  * Production shape ([[StreamingScreen]]'s exactly): the two
  * fixed-point log tables are a small static artifact calibrated
  * offline from the reference slice (refreshed by
  * [[graft.operators.Perplexity.mergeCounts]] after ingest batches —
  * never a rescan) and ride the stream as constant-folded literals;
  * scoring is a stateless per-row projection — no state store, no
  * watermark, no stream-static join. Batch and stream share
  * [[graft.operators.Perplexity.scoreWith]] verbatim, so stream
  * scores are bit-equal to the batch operator's by construction
  * (asserted anyway in StreamingPerplexitySpec).
  */
object StreamingPerplexity {

  /** `docs` is a streaming (or batch — same code path) frame with
    * `doc_id` and `text`; emits the batch operator's exact schema
    * `(doc_id, n_grams, xent_micro, xent)`.
    */
  def apply(docs: DataFrame,
    lam1: Array[Long], lam2: Array[Long]): DataFrame =
    Perplexity.scoreWith(docs, lam1, lam2)
}
