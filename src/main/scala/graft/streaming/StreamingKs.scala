package graft.streaming

import graft.operators.Ks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KS drift monitoring on the event stream — the continuous form of
  * [[Ks.ksDrift]], split maintenance-from-detection exactly like
  * [[StreamingChangepoint]]: the stream maintains ONLY the
  * per-(type, value) count cells of the LIVE arm (a standard
  * incremental aggregation — partials merge into the state store, no
  * raw event kept), and the detector re-runs per trigger over those
  * cells merged against a STATIC reference arm (yesterday's corpus,
  * the training window — the `bm25Stats` stored-statistic contract).
  * Detection cost is O(distinct values · types) — independent of
  * event volume — so "has the metric's distribution moved off the
  * baseline" stays answerable every trigger at 100 TB/day.
  *
  * State is bounded by the metric's DISTINCT-value count (micro-round
  * a continuous metric to fix the grid; the rescan-free alternative
  * at unbounded cardinality is KS over [[graft.operators.Kmv]]
  * bottom-k CDFs at ±ε). Batch ≡ stream at BOTH layers, asserted in
  * StreamingKsSpec: maintained cells equal the batch fold, and
  * detection over (reference ∪ maintained) reproduces the batch
  * [[Ks.ksDrift]] row for row when the reference is the batch
  * split's early arm.
  */
object StreamingKs {

  /** The maintained cell aggregation: `(event_type, value, n)` over a
    * streaming (or batch — same code path) events frame. Run in
    * Complete/Update mode into the detection sink.
    */
  def cells(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).cast("long").as("n"))

  /** Per-trigger detection: the static reference cells are the EARLY
    * arm, the maintained live cells the LATE arm; [[Ks.mergeCells]] +
    * [[Ks.fromCells]] inherit the batch operator's oracle-checked
    * semantics wholesale.
    */
  def detect(refCells: DataFrame, liveCells: DataFrame): DataFrame =
    Ks.fromCells(armCells(refCells, liveCells))

  /** PSI off the SAME maintained state ([[graft.operators.Psi]]'s
    * calibrated-decile scalar beside KS's sup-CDF test — two
    * detectors, one state store).
    */
  def detectPsi(refCells: DataFrame, liveCells: DataFrame): DataFrame =
    graft.operators.Psi.fromCells(armCells(refCells, liveCells))

  private def armCells(refCells: DataFrame, liveCells: DataFrame): DataFrame =
    Ks.mergeCells(
      refCells.select(col("event_type"), col("value"),
        col("n").as("c1"), lit(0L).as("c2")),
      liveCells.select(col("event_type"), col("value"),
        lit(0L).as("c1"), col("n").as("c2")))
}
