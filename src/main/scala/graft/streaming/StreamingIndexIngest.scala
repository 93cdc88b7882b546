package graft.streaming

import graft.sources.IndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous vector ingest into a stored IVF-PQ index — the streaming
  * face of [[IndexStore.append]]: each micro-batch of
  * `(vec_id, embedding)` rows is encoded with the STORED quantizers
  * (one narrow pass, no retraining) and appended into its `cent_id`
  * partitions, so a concurrent [[IndexStore.search]] probes old and
  * new vectors alike.
  *
  * `foreachBatch`, not a file sink: the write is a dynamic-partitioned
  * APPEND keyed by a DERIVED column (the coarse assignment computed
  * inside the batch), which the streaming file sink cannot express.
  * Exactly-once caveat: a replayed micro-batch re-appends its rows —
  * at-least-once like the reference's upload path; the store treats
  * vec_id as the identity authority and periodic rebuilds compact.
  */
object StreamingIndexIngest {

  def ingest(vectors: DataFrame, path: String): StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) IndexStore.append(batch, path)
      }
      .start()
}
