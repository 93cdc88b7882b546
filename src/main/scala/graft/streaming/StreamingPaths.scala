package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One typed event for path mining. */
case class PEvent(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

/** An emitted transition. */
case class Transition(user_id: Long, from_type: String, to_type: String,
  at_us: Long)

/** Per-user tail state: the last event inside the session window. */
case class PathState(last_us: Long, last_type: String)

/** Session-path transitions on the event stream — the continuous face
  * of [[graft.operators.Paths]]: each user's state is ONE (last event
  * time, last type) pair; an arriving event within the 30-min gap
  * emits its transition, a later one starts a fresh session silently.
  * State is O(1) per user and event-time timeout drops idle users at
  * gap expiry — after which no arriving event could pair with the
  * stored tail anyway (the gap rule and the TTL are the same
  * constant, so expiry is semantically invisible). Batch ≡ stream on
  * ordered delivery asserted; the downstream transition COUNTS merge
  * by addition, so a periodic batch fold over the emitted pairs
  * reproduces `q_session_paths` exactly.
  */
object StreamingPaths {

  val GapUs: Long = graft.operators.Paths.GapUs

  def update(uid: Long, events: Iterator[PEvent],
    state: GroupState[PathState]): Iterator[Transition] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    // exact event-time microseconds (getTime truncates to ms — a
    // sub-ms fixture gap just over GapUs would truncate INTO the gap,
    // and same-ms events could sort differently than batch, breaking
    // the asserted batch ≡ stream parity; the StreamingIntervalUnion
    // rule): seconds·1e6 + full sub-second nanos/1e3, also the sort key
    def usOf(e: PEvent): Long =
      math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L
    val sorted = events.toSeq.sortBy(e => (usOf(e), e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var out = List.empty[Transition]
    var cur = state.getOption
    sorted.foreach { e =>
      val us = usOf(e)
      cur match {
        case Some(st) if us - st.last_us <= GapUs =>
          out ::= Transition(uid, st.last_type, e.event_type, us)
        case _ => ()
      }
      cur = Some(PathState(us, e.event_type))
    }
    val st = cur.get
    state.update(st)
    state.setTimeoutTimestamp(st.last_us / 1000 + GapUs / 1000)
    out.reverse.iterator
  }

  def transitions(ds: Dataset[PEvent]): Dataset[Transition] = {
    implicit val se = Encoders.product[PathState]
    implicit val te = Encoders.product[Transition]
    implicit val le = Encoders.scalaLong
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
