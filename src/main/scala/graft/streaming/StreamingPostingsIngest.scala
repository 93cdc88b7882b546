package graft.streaming

import graft.sources.PostingsStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous document ingest into the stored lexical index — the
  * streaming face of [[PostingsStore.append]], completing the same
  * batch/stream symmetry the vector side has
  * ([[StreamingIndexIngest]]): each micro-batch of `(doc_id, text)`
  * rows tokenizes, lands its postings in their term buckets
  * (partitioned append) and merges the stats row, so a concurrent
  * [[PostingsStore.search]] ranks old and new documents alike with
  * exact df (search derives df from the append-only postings).
  *
  * `foreachBatch` for the same reason as the vector side: the write is
  * a dynamic-partitioned append keyed by a DERIVED column (the term
  * bucket), plus a sealed-generation stats merge — neither is a
  * streaming file sink shape. The batch id is forwarded so
  * [[PostingsStore.append]]'s commit markers make replays no-ops
  * (exactly-once at the store, not just at-least-once at the sink).
  */
object StreamingPostingsIngest {

  def ingest(docs: DataFrame, path: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) PostingsStore.append(batch, path, Some(batchId))
      }
      .start()
}
