package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shard-balanced corpus export — the final stage of a training-data
  * pipeline: the curated corpus written as evenly-sized parquet shards
  * a downstream trainer can stream round-robin. Two properties the
  * default writer does not give:
  *
  *  - **Bounded shard size**: `maxRecordsPerFile` caps every output
  *    file, so one fat task partition cannot emit a shard that stalls
  *    a data-loader worker.
  *  - **Deterministic global order**: `repartitionByRange` on the key
  *    lays shards out in key ranges, so shard N's contents are a
  *    function of the data, not of which executor finished first —
  *    re-exports are byte-comparable and resumable training sees a
  *    stable example order.
  *
  * Scale shape: one range shuffle (the sampler reads a bounded sketch
  * of the key column), then a streaming write — no collect, no
  * skew-prone groupBy. A hot key range is split across files by the
  * record cap; shard COUNT adapts to corpus size at a fixed target
  * size, which is the knob that survives a 100× scale-up (fixed shard
  * COUNT is the one that shrinks shards into metadata overhead).
  */
object ShardWriter {

  /** Write `df` ordered by `key` into shards of at most
    * `rowsPerShard` rows. `numRanges` defaults to a partition count
    * that lands ~one file per range at the target size.
    */
  def write(df: DataFrame, path: String, key: Column,
    rowsPerShard: Long, numRanges: Int = 0): Unit = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    val n =
      if (numRanges > 0) numRanges
      else math.max(1, math.min(10000,
        (df.count() / rowsPerShard).toInt + 1))
    df.repartitionByRange(n, key)
      .sortWithinPartitions(key)
      .write
      .option("maxRecordsPerFile", rowsPerShard)
      .mode("overwrite")
      .parquet(path)
  }
}
