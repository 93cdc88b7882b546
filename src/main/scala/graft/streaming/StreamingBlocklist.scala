package graft.streaming

import graft.operators.Blocklist
import org.apache.spark.sql.DataFrame

/** Blocklist screening on the ingest stream — the continuous face of
  * [[graft.operators.Blocklist]]: every arriving document is gated
  * before it enters the corpus (the [[StreamingScreen]] shape — the
  * blocklist is a bounded literal riding the projection, so the
  * operator is a stateless per-row map: no state store, no watermark,
  * no join). Batch and stream share the SAME code path, so the keep
  * decisions are identical by construction — asserted anyway in
  * StreamingBlocklistSpec against a memory-sink run.
  */
object StreamingBlocklist {

  /** `docs` is a streaming (or batch — same code path) frame with
    * `doc_id` and `text`; emits the batch screen's exact schema.
    */
  def apply(docs: DataFrame, terms: Seq[String] = Blocklist.Terms,
    softMax: Double = Blocklist.SoftMax): DataFrame =
    Blocklist.screen(docs, "doc_id", "text", terms, softMax)
}
