package graft.streaming

import graft.functions.{Bloom, TextSim}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contamination screening on the ingest stream — the continuous form
  * of [[graft.operators.Corpus.contaminationBloom]]: every arriving
  * document is probed against the held-out eval set's Bloom filter
  * BEFORE it enters the corpus, so contamination is rejected at the
  * door instead of swept up later.
  *
  * Production shape: the filter is a small static artifact built
  * offline from the eval suite (it changes when benchmarks do — rarely)
  * and rides the stream as a codegen reference object; the probe is a
  * stateless per-row projection, so the operator needs NO state store,
  * no watermark, and no stream-static join — strictly less machinery
  * than even the broadcast-join calibration of
  * [[StreamingFilterDomain]]. False negatives are impossible, so a doc
  * that slips past the screen truly shares nothing with the eval union;
  * flagged docs go to an exact verify side-channel (bounded by the FP
  * rate — the screen's precision knob is the filter's bits/gram).
  */
object StreamingScreen {

  /** `docs` is a streaming (or batch — same code path) frame with
    * `doc_id` and `text`; emits `(doc_id, n_hits, flagged)` with the
    * batch operator's exact schema and decision rule.
    */
  def apply(docs: DataFrame, f: Bloom.Filter, minHits: Int = 1): DataFrame =
    docs
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        Bloom.hits(TextSim.shingles3(col("t")), f).cast("long").as("n_hits"))
      .withColumn("flagged", col("n_hits") >= minHits)
}
