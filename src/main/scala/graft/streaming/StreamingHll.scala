package graft.streaming

import graft.operators.Hll
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous distinct counting — the streaming face of [[Hll]]: each
  * micro-batch folds to its m-row register table
  * ([[Hll.sketch]], map-side-combined, ≤ m rows leave the batch) and
  * merges into a resident register array by per-bucket MAX — the same
  * associative/idempotent/duplicate-blind rule the batch merge story
  * is built on, so a REPLAYED micro-batch is a no-op by algebra (the
  * rare streaming operator that is exactly-once for free: max is
  * idempotent, where [[StreamingPostingsIngest]] needs commit markers
  * because addition is not).
  *
  * State is the m-int register array — constant in stream length and
  * cardinality; no state store, no watermark (registers never expire:
  * the sketch counts distincts over the whole stream; windowed
  * distinct counting is the batch [[Hll.sketchBy]] keyed on the
  * window). The per-batch m-row collect rides the bounded-statistic
  * contract (m = 64 default — the same rows the batch estimate reads).
  */
object StreamingHll {

  /** Resident register table, merged under per-bucket max. Thread-safe
    * via synchronization — foreachBatch calls arrive serially per
    * query, but the read side (estimate) may be another thread.
    */
  final class Counter(val m: Int = Hll.M) {
    private val regs = new Array[Int](m)

    def observe(batch: DataFrame, key: Column): Unit = {
      val batchRegs = Hll.sketch(batch, key, m)
        .collect().map(r => (r.getLong(0).toInt, r.getInt(1)))
      synchronized {
        batchRegs.foreach { case (b, r) => if (r > regs(b)) regs(b) = r }
      }
    }

    def registers: Map[Long, Int] = synchronized {
      regs.zipWithIndex.map { case (r, b) => b.toLong -> r }.toMap
    }

    /** Same arithmetic as [[Hll.estimate]], read off resident state. */
    def estimate: Double = synchronized {
      Hll.alpha(m) * m * m / regs.map(r => math.pow(2.0, -r)).sum
    }
  }

  /** Start the fold: each micro-batch of `frame` sketches `key` and
    * merges into `counter`.
    */
  def ingest(frame: DataFrame, key: Column, counter: Counter): StreamingQuery =
    frame.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) counter.observe(batch, key)
      }
      .start()
}
