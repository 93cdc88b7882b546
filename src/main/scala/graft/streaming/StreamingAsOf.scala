package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A left event to enrich (the batch mirror's "purchase"). */
case class AsOfLeft(event_id: Long, user_id: Long, ts: Timestamp, value: Double)

/** A right reference row (the batch mirror's deduped "click"). */
case class AsOfRight(user_id: Long, ts: Timestamp, ref_id: Long)

/** Enriched output: left row + the matched right (None = no prior). */
case class AsOfOut(event_id: Long, user_id: Long, ts: Timestamp, value: Double,
                   ref_id: Option[Long], ref_ts_us: Option[Long], gap_us: Option[Long])

private[streaming] case class AsOfEvt(side: Int, id: Long, user_id: Long,
                                      ts: Timestamp, value: Double)

/** One retained right row in state. */
private[streaming] case class RightRec(ts_us: Long, ref_id: Long)

private[streaming] case class AsOfState(rights: List[RightRec], lastSeenMs: Long)

/** Streaming AS-OF enrichment — the continuous face of
  * `TimeJoin.asOfPrior`: each left event is emitted with the LATEST
  * right row at-or-before it on the same key (the feature-store /
  * latest-known-state join: orders against the freshest quote, events
  * against the dimension snapshot in force at the event's instant).
  *
  * State per key is the right-row history inside the watermark
  * horizon, PLUS one floor row (the latest right at-or-below the
  * horizon) — so a LATE left event still matches the right row that
  * was in force at its event time, not whatever arrived most recently;
  * naive latest-state joins get exactly this wrong. History is pruned
  * to the horizon every batch, so state is bounded by key churn within
  * the watermark window, never by stream length; an idle key's floor
  * is dropped by an event-time TTL like `StreamingDedup`'s.
  *
  * Contract (append mode): a left event is enriched with everything
  * known when its micro-batch commits — state plus same-batch rights,
  * walked in (ts, side, id) order so a same-instant right matches (the
  * `>=` ASOF convention) and in-batch order never matters. A right
  * arriving in a LATER batch than a left it should have served is
  * missed for that left — the price of append-mode emission; stream ≡
  * batch whenever each key's rights are not late relative to its
  * lefts, asserted in StreamingAsOfSpec.
  */
object StreamingAsOf {

  /** Idle-key state TTL past the last sighting (event time). */
  val StateTtlMs: Long = 24L * 3600 * 1000

  /** Event-time in µs. `Timestamp.getTime` alone truncates to ms —
    * enough for sessions, but this operator's gap must equal the
    * batch `unix_micros` arithmetic bit-for-bit.
    */
  private def tsUs(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def update(uid: Long, evts: Iterator[AsOfEvt],
    state: GroupState[AsOfState]): Iterator[AsOfOut] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val batch = evts.toSeq.sortBy(e => (tsUs(e.ts), e.side, e.id))
    if (batch.isEmpty) return Iterator.empty
    // rights keyed by instant; one survivor per instant (max ref_id,
    // the batch dedup rule) — TreeMap gives the floor lookup
    var rights = scala.collection.immutable.TreeMap.empty[Long, Long] ++
      state.getOption.map(_.rights.map(r => r.ts_us -> r.ref_id)).getOrElse(Nil)
    var out = List.empty[AsOfOut]
    batch.foreach { e =>
      val us = tsUs(e.ts)
      if (e.side == 0) {
        val kept = math.max(rights.getOrElse(us, Long.MinValue), e.id)
        rights = rights.updated(us, kept)
      } else {
        val m = rights.rangeTo(us).lastOption
        out ::= AsOfOut(e.id, uid, e.ts, e.value,
          m.map(_._2), m.map(_._1), m.map(us - _._1))
      }
    }
    // prune to the watermark horizon, keeping the floor row
    val horizonUs = state.getCurrentWatermarkMs() * 1000
    val floor = rights.rangeTo(horizonUs).lastOption
    val pruned = floor.toList ++ rights.rangeFrom(horizonUs + 1).toList
    val lastSeen = math.max(state.getOption.map(_.lastSeenMs).getOrElse(0L),
      batch.map(_.ts.getTime).max)
    state.update(AsOfState(pruned.map { case (t, r) => RightRec(t, r) }, lastSeen))
    // a late batch can put lastSeen + TTL below the watermark, which
    // Spark rejects; clamp so such a key expires at the next trigger
    state.setTimeoutTimestamp(
      math.max(lastSeen + StateTtlMs, state.getCurrentWatermarkMs() + 1))
    out.reverseIterator
  }

  /** Wire two streams into the keyed as-of enrichment. The watermark
    * delay is caller policy: it bounds BOTH the right-history size and
    * how late a left/right row may arrive and still be honored.
    */
  def asOf(left: Dataset[AsOfLeft], right: Dataset[AsOfRight],
           watermarkDelay: String = "10 minutes"): Dataset[AsOfOut] = {
    implicit val ee = Encoders.product[AsOfEvt]
    implicit val oe = Encoders.product[AsOfOut]
    implicit val se = Encoders.product[AsOfState]
    implicit val ke = Encoders.scalaLong
    val l = left.map(e => AsOfEvt(1, e.event_id, e.user_id, e.ts, e.value))
    val r = right.map(e => AsOfEvt(0, e.ref_id, e.user_id, e.ts, 0.0))
    l.unionByName(r)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update _)
  }
}
