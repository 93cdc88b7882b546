package graft.streaming

import graft.operators.Linkage
import org.apache.spark.sql.DataFrame

/** Record linkage on the ingest stream — the continuous face of
  * [[Linkage]]: arriving registry records `(b_id, b_name, b_nation,
  * b_seg, b_cents)` are blocked and scored against the STATIC house
  * side per micro-batch, through the stream-compatible pass pair
  * [[Linkage.candidatesEqui]] (name-key equi-join ∪ exact-cents
  * equi-join — a name rank over the incoming stream isn't expressible
  * statelessly, so the batch side's sorted-neighborhood budget
  * degrades to the plain cents block here; identical pairs whenever
  * blocks fit the budget, asserted on the fixture). Two stream-static
  * equi-joins unioned: no state store, no watermark, append mode —
  * the static side is the slowly-changing house registry re-read per
  * batch (bucket it by cents at scale so the per-batch join is
  * exchange-free on the stored side). Batch and stream share
  * [[Linkage.linkedEqui]] verbatim, so the verdicts match row for
  * row.
  */
object StreamingLinkage {

  /** `incoming` is a STREAMING frame with the registry schema;
    * `house` is the static `(a_id, nm, nat, seg, cents)` side.
    */
  def apply(incoming: DataFrame, house: DataFrame): DataFrame =
    Linkage.linkedEqui(house, incoming)
}
