package graft.streaming

import java.sql.Timestamp

import graft.operators.IntervalUnion
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event row for the streaming sweep line. */
case class IuEvent(user_id: Long, event_id: Long, ts: Timestamp)

/** A finalized merged coverage span. */
case class SpanRow(user_id: Long, s0: Long, e1: Long, n_events: Long)

/** Open-span set carried across micro-batches (ascending by start;
  * disjoint by construction — the sweep-line invariant).
  */
case class IuState(starts: List[Long], ends: List[Long], counts: List[Long])

/** The interval-union sweep line on the stream — the continuous form
  * of [[graft.operators.IntervalUnion]]: every event contributes
  * [ts, ts+W) and the state keeps each user's OPEN merged spans.
  * Unlike the batch pass, arrivals are out of order within the
  * watermark horizon, so a new interval may not only extend the last
  * span but BRIDGE two existing ones — the state is therefore the
  * (disjoint, sorted) span set, merged on every insert; it stays
  * bounded because a span whose end falls behind the watermark can
  * never be extended (any bridging event would be later than the
  * watermark, and a LATE event is dropped by it) and is emitted as
  * final. Per-user state is O(open spans in the horizon) — horizon/W
  * entries at worst, independent of throughput.
  *
  * Batch ≡ stream: finalized + still-open spans together equal the
  * batch sweep's span set exactly (asserted in
  * StreamingIntervalUnionSpec under shuffled multi-batch replay of
  * the corpus; per-user coverage totals equal `q_interval_union`'s).
  */
object StreamingIntervalUnion {

  val W: Long = IntervalUnion.WindowUs

  /** Insert [s, e) with count 1 into a disjoint sorted span set,
    * merging everything it touches (touching merges — the batch
    * rule's strict `>` break).
    */
  private[graft] def insert(st: IuState, s: Long, e: Long): IuState = {
    val zipped = (st.starts, st.ends, st.counts).zipped.toList
    val (left, rest) = zipped.partition(_._2 < s) // strictly before, no touch
    val (overlap, right) = rest.partition(_._1 <= e) // touches/overlaps [s,e)
    val ms = (s :: overlap.map(_._1)).min
    val me = (e :: overlap.map(_._2)).max
    val mc = 1L + overlap.map(_._3).sum
    val all = left ::: ((ms, me, mc) :: right)
    IuState(all.map(_._1), all.map(_._2), all.map(_._3))
  }

  def update(uid: Long, events: Iterator[IuEvent],
    state: GroupState[IuState]): Iterator[SpanRow] = {
    if (state.hasTimedOut) {
      // watermark passed every open end: all spans final
      val st = state.get
      state.remove()
      return (st.starts, st.ends, st.counts).zipped
        .map(SpanRow(uid, _, _, _)).iterator
    }
    var st = state.getOption.getOrElse(IuState(Nil, Nil, Nil))
    events.foreach { e =>
      // exact MICROSECONDS (getTime is ms-truncated; the fixture
      // carries sub-ms precision and the batch operator compares
      // unix_micros — a ms-truncated stream would merge spans the
      // batch sweep splits by a sub-ms gap)
      val s = (e.ts.getTime / 1000L) * 1000000L + e.ts.getNanos / 1000L
      st = insert(st, s, s + W)
    }
    // finalize spans that the watermark has sealed: no future event
    // (all ≥ watermark) can start at or before a sealed end
    val wmUs = state.getCurrentWatermarkMs() * 1000
    val zipped = (st.starts, st.ends, st.counts).zipped.toList
    val (closed, open) = zipped.partition(_._2 < wmUs)
    if (open.isEmpty) state.remove()
    else {
      val ns = IuState(open.map(_._1), open.map(_._2), open.map(_._3))
      state.update(ns)
      state.setTimeoutTimestamp(open.map(_._2).max / 1000 + 1)
    }
    closed.map { case (s0, e1, n) => SpanRow(uid, s0, e1, n) }.iterator
  }

  def spans(ds: Dataset[IuEvent]): Dataset[SpanRow] = {
    implicit val se = Encoders.product[IuState]
    implicit val re = Encoders.product[SpanRow]
    implicit val le = Encoders.scalaLong
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
