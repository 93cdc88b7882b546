package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incoming document (or chunk) on the ingest stream. */
case class DocIn(doc_id: Long, content_hash: String, ts: Timestamp)

/** Streaming exact dedup — the continuous version of `q_dedup_exact`:
  * the first document per content hash passes through, every later
  * copy is dropped, across micro-batches.
  *
  * State per hash is one boolean (plus Spark's key overhead); keys are
  * hash-partitioned so the dedup scales horizontally with no cross-key
  * coordination. Event-time TTL (`StateTtlMs` past the last sighting,
  * enforced via watermark timeout) bounds the store: a hash unseen for
  * the TTL window is forgotten — at 100 TB/day an unbounded seen-set
  * is not an option, so the contract is "exact within the TTL
  * horizon", the same tradeoff production ingest dedup makes. For
  * all-time exactness, compact the store into a bloom/exact manifest
  * table and anti-join batches against it offline.
  */
object StreamingDedup {

  val StateTtlMs: Long = 24L * 3600 * 1000

  def update(hash: String, docs: Iterator[DocIn],
    state: GroupState[Long]): Iterator[DocIn] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val batch = docs.toSeq
    if (batch.isEmpty) return Iterator.empty
    val out =
      if (state.exists) Iterator.empty
      else Iterator(batch.minBy(d => (d.ts.getTime, d.doc_id)))
    val lastSeen = math.max(state.getOption.getOrElse(0L),
      batch.map(_.ts.getTime).max)
    state.update(lastSeen)
    state.setTimeoutTimestamp(lastSeen + StateTtlMs)
    out
  }

  def dedup(ds: Dataset[DocIn]): Dataset[DocIn] = {
    implicit val de = Encoders.product[DocIn]
    implicit val se = Encoders.scalaLong
    implicit val ke = Encoders.STRING
    ds.withWatermark("ts", "10 minutes")
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update _)
  }
}
