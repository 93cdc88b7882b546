package graft.streaming

import java.sql.Timestamp

import graft.operators.Attribution
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One typed event for attribution. */
case class AEvent(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

/** One credited journey, emitted at the purchase that closes it. */
case class Journey(user_id: Long, p_id: Long, first_type: String,
  last_type: String, n_touches: Long)

/** Per-user state: the touches inside the lookback window. */
case class TouchState(touches: List[(Long, Long, String)]) // (us, id, type)

/** Conversion attribution on the event stream — the continuous face
  * of [[Attribution]]: each user's state is their touch tail inside
  * the lookback window; an arriving purchase emits its credited
  * journey (first/last touch, journey size — the downstream
  * first_n/last_n/linear folds are count/sum aggregations that merge
  * by addition, so a periodic batch fold over emitted journeys
  * reproduces `q_attribution`'s totals). State is BOUNDED by the
  * lookback window (touches older than it are pruned on every
  * update), and event-time timeout drops idle users at window expiry
  * — after which no arriving purchase could credit the stored tail
  * anyway, so expiry is semantically invisible (the StreamingPaths
  * discipline). Batch ≡ stream on ordered delivery asserted in
  * StreamingAttributionSpec: per-purchase (first, last, n) equal the
  * batch journey stats row for row.
  */
object StreamingAttribution {

  val LookbackUs: Long = Attribution.LookbackUs

  private def usOf(e: AEvent): Long =
    math.floorDiv(e.ts.getTime, 1000L) * 1000000L + e.ts.getNanos / 1000L

  def update(uid: Long, events: Iterator[AEvent],
    state: GroupState[TouchState]): Iterator[Journey] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = events.toSeq.sortBy(e => (usOf(e), e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var touches = state.getOption.map(_.touches).getOrElse(Nil)
    var out = List.empty[Journey]
    sorted.foreach { e =>
      val us = usOf(e)
      touches = touches.filter { case (tu, _, _) => tu >= us - LookbackUs }
      if (e.event_type == "purchase") {
        // journey = in-window touches strictly before the purchase
        val j = touches.filter { case (tu, _, _) => tu < us }
        if (j.isEmpty) out ::= Journey(uid, e.event_id, "(direct)", "(direct)", 0L)
        else {
          val f = j.minBy { case (tu, ti, _) => (tu, ti) }
          val l = j.maxBy { case (tu, ti, _) => (tu, ti) }
          out ::= Journey(uid, e.event_id, f._3, l._3, j.size.toLong)
        }
      } else {
        touches = (us, e.event_id, e.event_type) :: touches
      }
    }
    if (touches.isEmpty) state.remove()
    else {
      state.update(TouchState(touches))
      val newest = touches.map(_._1).max
      state.setTimeoutTimestamp(newest / 1000 + LookbackUs / 1000)
    }
    out.reverse.iterator
  }

  def journeys(ds: Dataset[AEvent]): Dataset[Journey] = {
    implicit val se = Encoders.product[TouchState]
    implicit val je = Encoders.product[Journey]
    implicit val le = Encoders.scalaLong
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
