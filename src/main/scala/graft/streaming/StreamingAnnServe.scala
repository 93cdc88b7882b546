package graft.streaming

import graft.sources.IndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous ANN serving — the query-side complement of
  * [[StreamingIndexIngest]]: micro-batches of `(vec_id, embedding)`
  * query vectors are searched against an OPEN stored index and the
  * ranked hits append to a parquet result log.
  *
  * `foreachBatch`, not a streaming join: each batch's plan is a
  * broadcast-probes ⋈ partition-pruned-scan against a STATIC index —
  * there is no streaming state, no watermark, and the sink is a plain
  * append. The [[IndexStore.Handle]] is opened once by the caller, so
  * the per-batch cost is exactly one probe assignment + pruned list
  * scan (the Handle contract); index metadata is never re-read while
  * the stream runs, and the handle's pinned generation makes results
  * consistent even if a compaction lands mid-stream.
  */
object StreamingAnnServe {

  def serve(queries: DataFrame, handle: IndexStore.Handle, outPath: String,
    k: Int = graft.operators.Ann.TopK,
    nprobe: Int = graft.operators.Ann.NProbe,
    margin: Option[Double] = None): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          handle.search(batch, k, nprobe, margin)
            .write.mode("append").parquet(outPath)
      }
      .start()
}
