package graft.streaming

import graft.operators.NaiveBayes
import org.apache.spark.sql.DataFrame

/** Classifier routing on the ingest stream — the continuous form of
  * [[graft.operators.NaiveBayes]]: every arriving document is scored
  * and routed (language, quality tier, source bucket) BEFORE it
  * enters the corpus, the [[StreamingPerplexity]] deployment shape.
  *
  * The fitted [[graft.operators.NaiveBayes.Model]] is a small static
  * artifact trained offline (refreshed after ingest batches by
  * [[graft.operators.NaiveBayes.mergeCounts]] — never a rescan) whose
  * tables ride the stream as constant-folded literals; scoring is a
  * stateless per-row projection — no state store, no watermark, no
  * stream-static join. Batch and stream share
  * [[graft.operators.NaiveBayes.scoreWith]] verbatim, so stream
  * predictions are bit-equal to the batch operator's by construction
  * (asserted anyway in NaiveBayesSpec).
  */
object StreamingNbClassify {

  /** `docs` is a streaming (or batch — same code path) frame with
    * `doc_id`, `text` and the label column; emits the batch schema
    * `(doc_id, label, n_toks, pred, score_micro, margin_micro)`.
    */
  def apply(docs: DataFrame, model: NaiveBayes.Model,
    labelCol: String = "lang"): DataFrame =
    NaiveBayes.scoreWith(docs, model, labelCol)
}
