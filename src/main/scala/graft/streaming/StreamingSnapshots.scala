package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A fetch observation on the crawl stream. */
case class FetchIn(doc_id: Long, ts: Timestamp, hash: String)

/** The authoritative per-page row the stream maintains. */
case class PageState(doc_id: Long, kept_ts: Long, kept_hash: String,
  n_fetches: Long)

/** Continuous latest-wins snapshot collapse — the streaming face of
  * [[graft.operators.Snapshots.latestWins]]: as refetches arrive, each
  * page's state converges to its authoritative (latest) fetch, emitted
  * on every change so a downstream upsert sink always holds the
  * current row. Out-of-order arrivals are absorbed by the max-ts rule
  * (a late straggler older than the kept row changes nothing — the
  * same argmax the batch fold computes).
  *
  * State per page is O(1): the kept (ts, hash) pair and a fetch
  * counter — deliberately NOT the distinct-version set, which is
  * unbounded per key on a stream; version-cardinality reporting
  * (`n_versions`, `changed`) is the batch report's job over the fetch
  * log. Event-time TTL forgets pages unfetched for the horizon.
  */
object StreamingSnapshots {

  val StateTtlMs: Long = 7L * 24 * 3600 * 1000

  def update(key: Long, fetches: Iterator[FetchIn],
    state: GroupState[PageState]): Iterator[PageState] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val batch = fetches.toSeq
    if (batch.isEmpty) return Iterator.empty
    val prev = state.getOption
    val best = batch.maxBy(f => (f.ts.getTime, f.hash))
    val bt = best.ts.getTime
    val kept = prev match {
      case Some(p) if p.kept_ts > bt ||
        (p.kept_ts == bt && p.kept_hash >= best.hash) =>
        p.copy(n_fetches = p.n_fetches + batch.size)
      case Some(p) =>
        PageState(key, bt, best.hash, p.n_fetches + batch.size)
      case None =>
        PageState(key, bt, best.hash, batch.size.toLong)
    }
    state.update(kept)
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1,
        batch.map(_.ts.getTime).max + StateTtlMs))
    Iterator(kept)
  }

  def collapse(ds: Dataset[FetchIn]): Dataset[PageState] = {
    implicit val fe = Encoders.product[FetchIn]
    implicit val pe = Encoders.product[PageState]
    implicit val ke = Encoders.scalaLong
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout())(update _)
  }
}
