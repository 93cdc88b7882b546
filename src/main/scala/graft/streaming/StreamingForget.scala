package graft.streaming

import graft.sources.{IndexStore, PostingsStore, SignatureStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous deletion — the streaming face of the three `forget`
  * operations: a stream of deletion requests (GDPR erasure, source
  * takedowns, license revocations) drains into the persistent stores
  * as each micro-batch arrives, so the corpus converges on compliance
  * without waiting for a nightly job.
  *
  * `foreachBatch` because each delete is a partition-scoped rewrite
  * (index lists / term buckets) or a tombstone append — not a
  * streaming sink shape. Replay-safe WITHOUT markers: all three
  * forgets are idempotent by construction (a second deletion of the
  * same ids finds no rows — [[PostingsStore.forget]] and
  * [[IndexStore.forget]] return 0 affected partitions; a duplicate
  * tombstone row is absorbed by the anti-join), so at-least-once
  * delivery yields exactly-once effect.
  *
  * WRITER CONTRACT: deletion batches inherit the stores'
  * single-writer rule — schedule this stream in the same slot that
  * owns ingest/compaction for the targeted store, or pause one while
  * the other runs.
  */
object StreamingForget {

  /** Drain `(doc_id)` deletion requests into a [[PostingsStore]]. */
  def postings(ids: DataFrame, path: String): StreamingQuery =
    ids.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          PostingsStore.forget(batch.sparkSession, path,
            batch.select(col("doc_id")))
          ()
        }
      }
      .start()

  /** Drain `(vec_id)` deletion requests into an [[IndexStore]]. */
  def index(ids: DataFrame, path: String): StreamingQuery =
    ids.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          IndexStore.forget(batch.sparkSession, path,
            batch.select(col("vec_id")))
          ()
        }
      }
      .start()

  /** Drain `(doc_id)` deletion requests into a [[SignatureStore]]
    * tombstone table (O(deletes) per batch; fold in physically with
    * [[SignatureStore.compactTombstones]] on the maintenance
    * schedule).
    */
  def signatures(ids: DataFrame, table: String): StreamingQuery =
    ids.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          SignatureStore.forget(batch.select(col("doc_id")), table)
      }
      .start()
}
