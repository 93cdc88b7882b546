package graft.streaming

import graft.operators.Bootstrap
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous uncertainty — the streaming face of [[Bootstrap]]: the
  * Poisson bootstrap's whole state is B (Σwx, Σw) accumulators plus
  * the (n, Σx) point pair, and every one of them is an ADDITIVE fold
  * of per-row deterministic terms (weights keyed by md5(replicate,
  * id), not by arrival), so each micro-batch folds to B+1 rows and
  * merges into the resident array by addition; the CI re-derives on
  * read from the B-row state, volume-independent. A confidence
  * interval that tightens live as the corpus accretes.
  *
  * Addition is NOT idempotent — a replayed micro-batch double-counts
  * (the [[StreamingPostingsIngest]] caveat, vs [[StreamingHll]]'s
  * free idempotence); exactly-once delivery or upstream dedup is the
  * contract, same as every additive streaming fold here.
  */
object StreamingBootstrap {

  /** Resident accumulators; read side may be another thread. */
  final class Interval {
    private val swx = new Array[Long](Bootstrap.NumReps + 1)
    private val sw = new Array[Long](Bootstrap.NumReps + 1)
    private var nDocs = 0L
    private var sx = 0L

    def observe(batch: DataFrame): Unit = {
      val b = batch.persist()
      val reps = Bootstrap.repAccums(b)
        .collect().map(r => (r.getAs[Int]("r"), r.getAs[Long]("swx"),
          r.getAs[Long]("sw")))
      val pt = b.agg(count(lit(1)).cast("long"), sum(col("x")).cast("long"))
        .collect().head
      b.unpersist()
      synchronized {
        reps.foreach { case (r, wx, w) => swx(r) += wx; sw(r) += w }
        nDocs += pt.getLong(0)
        if (!pt.isNullAt(1)) sx += pt.getLong(1)
      }
    }

    /** Same arithmetic as [[Bootstrap.bootstrap]], read off resident
      * state: Some((n_docs, n_reps, mean_micro, lo_micro, hi_micro)),
      * or None before any non-empty batch has been observed — a
      * monitor thread polling freshly-started state must not crash on
      * an empty replicate list (index −1) or a 0-doc mean division.
      */
    def report: Option[(Long, Long, Long, Long, Long)] = synchronized {
      val ms = (1 to Bootstrap.NumReps)
        .filter(r => sw(r) > 0)
        .map(r => (Math.floorDiv(1000000L * swx(r), sw(r)), r.toLong))
        .sorted
      val nReps = ms.size.toLong
      if (nReps == 0 || nDocs == 0) None
      else {
        val lo = ms(math.ceil(nReps * 0.025).toInt - 1)._1
        val hi = ms(math.ceil(nReps * 0.975).toInt - 1)._1
        Some((nDocs, nReps, Math.floorDiv(1000000L * sx, nDocs), lo, hi))
      }
    }
  }

  /** Start the fold: each micro-batch of `(id, x)` rows merges into
    * `interval`.
    */
  def ingest(rows: DataFrame, interval: Interval): StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) interval.observe(batch)
      }
      .start()
}
