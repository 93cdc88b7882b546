package graft.streaming

import graft.operators.Linkage
import org.apache.spark.sql.DataFrame

/** Record linkage on the ingest stream — the continuous face of
  * [[Linkage]]: arriving registry records `(b_id, b_name, b_nation,
  * b_seg, b_cents)` are blocked and scored against the STATIC house
  * side per micro-batch. A stream-static equi-join on the block key:
  * no state store, no watermark, append mode — the static side is the
  * slowly-changing registry re-read per batch (bucket it by the block
  * key at scale so the per-batch join is exchange-free on the stored
  * side). Batch and stream share [[Linkage.linked]] verbatim, so the
  * verdicts match row for row.
  */
object StreamingLinkage {

  /** `incoming` is a STREAMING frame with the registry schema;
    * `house` is the static `(a_id, nm, nat, seg, cents)` side.
    */
  def apply(incoming: DataFrame, house: DataFrame): DataFrame =
    Linkage.linked(house, incoming)
}
