package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-point monitoring on the event stream — the continuous form
  * of [[graft.operators.Changepoint]]: the stream maintains ONLY the
  * per-(type, hour) count cells (a standard incremental aggregation —
  * map-side partials merge into the state store, no raw event is ever
  * kept), and the detector re-runs per trigger over that H·|types|-row
  * cell frame via [[graft.operators.Changepoint.detect]]. Splitting
  * maintenance from detection is the point: detection is O(H·|types|)
  * — independent of event volume — so "did the baseline shift" stays
  * answerable every trigger at 100 TB/day, while the heavy side
  * (counting) is the one aggregation Structured Streaming already
  * does incrementally and exactly.
  *
  * State is bounded by the TIME span of the monitored window (H rows
  * per type), not by throughput; a production deployment caps it by
  * sliding the window (drop cells older than the horizon before
  * detection — the detector only sees the frame it is handed).
  * Batch ≡ stream: the maintained cells are exactly
  * [[graft.operators.Changepoint.cells]] of the events seen so far
  * (asserted in StreamingChangepointSpec along with detector-output
  * equality), so the streamed detector inherits the batch operator's
  * oracle-checked semantics wholesale.
  */
object StreamingChangepoint {

  /** The maintained cell aggregation: `(h, event_type, y)` over a
    * streaming (or batch — same code path) events frame. Run in
    * Complete/Update mode into the detection sink; each trigger's
    * table feeds [[graft.operators.Changepoint.detect]] unchanged.
    */
  def cells(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("y"))
      .select(col("window.start").as("h"), col("event_type"), col("y"))
}
