package graft.streaming

import graft.functions.Cms
import graft.operators.DupScore
import org.apache.spark.sql.DataFrame

/** Duplication scoring on the ingest stream — the continuous form of
  * [[graft.operators.DupScore]]: every arriving document is scored
  * against the corpus count-min sketch BEFORE it enters the corpus,
  * so template spam and mirror floods are flagged at the door at
  * scan cost (the [[StreamingScreen]] deployment shape, in counting
  * form).
  *
  * The sketch is a small static artifact fitted offline (refreshed
  * after ingest batches by [[graft.functions.Cms.Sketch.merge]] —
  * never a rescan) riding the stream as a kernel reference object;
  * scoring is a stateless per-row projection — no state store, no
  * watermark, no stream-static join. Batch and stream share
  * [[graft.operators.DupScore.scoreWith]] verbatim, so stream scores
  * are bit-equal to the batch operator's by construction (asserted
  * anyway in CmsSpec).
  */
object StreamingDupScore {

  /** `docs` is a streaming (or batch — same code path) frame with
    * `doc_id` and `text`; emits the batch schema
    * `(doc_id, n_shingles, est_sum, dup_score)`.
    */
  def apply(docs: DataFrame, sketch: Cms.Sketch): DataFrame =
    DupScore.scoreWith(docs, sketch)
}
