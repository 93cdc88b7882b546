package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch analytics operators.
  *
  * The reference pipeline is a poll-the-workspace batch loop
  * (Notion_openai_vector_etl.py:617-779, rerun per invocation); at
  * 100 TB/day the same semantics run continuously: a stream of events
  * with watermarked event time, incremental state instead of full
  * recompute.
  */
object StreamingHourly {

  /** Hourly tumbling-window aggregate over a (possibly streaming)
    * events frame — the streaming twin of
    * [[graft.operators.Analytics.eventsHourly]].
    *
    * Watermark bounds state: windows older than 2 h of event time are
    * finalized and dropped from the state store. Exact distinct-user
    * count is not streamable (unbounded per-window set) — the batch
    * mirror reports it; the stream keeps count/sum which are
    * partial-agg friendly (map-side combine before the shuffle).
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // same order-independent decimal sum + floor rounding as the
        // batch mirror — micro-batch merge order must not move the sum
        graft.functions.TextSim.r4(
          graft.functions.TextSim.dsum(col("value"))).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"))
}

/** Event row for the streaming sessionizer. */
case class SEvent(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

/** Closed session emitted by the streaming sessionizer. */
case class SessionRow(user_id: Long, n_events: Long, sum_value: Double,
  first_event: Long, last_event: Long, start_us: Long, end_us: Long)

/** Open-session state carried across micro-batches (event-time µs). */
case class SessState(start: Long, last: Long, n: Long, sum: Double,
  firstEvent: Long, lastEvent: Long)

/** Gap-based sessionizer via `flatMapGroupsWithState` — the streaming
  * twin of [[graft.operators.Analytics.sessionize]] (same 30-min gap
  * rule). State per user is one open session (constant size); event-time
  * timeout closes a session 30 min of watermark time after its last
  * event, so idle users cost nothing and state never grows unboundedly.
  */
object StreamingSessionize {

  val GapUs: Long = 30L * 60 * 1000000

  private def toRow(uid: Long, st: SessState): SessionRow =
    // same floor-based r4 convention as the batch mirror
    // (TextSim.r4: floor(x*1e4 + 0.5)/1e4), not rint's half-to-even
    SessionRow(uid, st.n, math.floor(st.sum * 10000 + 0.5) / 10000,
      st.firstEvent, st.lastEvent, st.start, st.last)

  /** One user's update: absorb the batch's events in (ts, event_id)
    * order, emit every session closed by a 30-min gap, keep the open
    * tail in state with a timeout at last+30min of event time.
    */
  def update(uid: Long, events: Iterator[SEvent],
    state: GroupState[SessState]): Iterator[SessionRow] = {
    if (state.hasTimedOut) {
      val closed = toRow(uid, state.get)
      state.remove()
      return Iterator(closed)
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var out = List.empty[SessionRow]
    var cur = state.getOption
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000
      cur match {
        case Some(st) if us - st.last > GapUs =>
          out ::= toRow(uid, st)
          cur = Some(SessState(us, us, 1, e.value, e.event_id, e.event_id))
        case Some(st) =>
          cur = Some(SessState(st.start, math.max(st.last, us), st.n + 1,
            st.sum + e.value, st.firstEvent, e.event_id))
        case None =>
          cur = Some(SessState(us, us, 1, e.value, e.event_id, e.event_id))
      }
    }
    val st = cur.get
    state.update(st)
    state.setTimeoutTimestamp(st.last / 1000 + GapUs / 1000)
    out.reverse.iterator
  }

  def sessionize(ds: Dataset[SEvent]): Dataset[SessionRow] = {
    implicit val se = Encoders.product[SessState]
    implicit val re = Encoders.product[SessionRow]
    implicit val le = Encoders.scalaLong
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
