package graft

import graft.operators.DpRelease
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** DP release on a stream. Two regimes, and the spec demonstrates the
  * line between them:
  *
  *  1. [[DpRelease.releaseCounts]] with sticky noise is sound for ONE
  *     publication: re-running the same release re-derives identical
  *     output (determinism). But publishing it per trigger while the
  *     cells evolve is NOT ε-DP for any finite ε: the fixed draw
  *     cancels in the difference, so every inter-trigger delta leaks
  *     EXACTLY — the first test asserts the leak (released deltas ==
  *     true deltas) as the documented counterexample.
  *  2. [[DpRelease.continualCounts]] (the binary/tree counter,
  *     Chan–Shi–Song 2011) is the per-trigger-sound form: per-node
  *     sticky noise over a dyadic epoch hierarchy, (levels·ln 2)-DP
  *     for the WHOLE schedule. The second test runs it per trigger
  *     under epoch-ordered arrival and asserts (a) bit-parity with
  *     the batch release of the same prefix and (b) that published
  *     day-over-day deltas are noisy, not the exact true deltas.
  */
class StreamingDpSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("naive per-trigger re-release leaks exact deltas (the documented counterexample)") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.documents(spark, sf)
      .select(col("source"), col("lang"))
      .as[(String, String)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)

    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("source", "lang")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .writeStream.format("memory").queryName("dp_cells")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      val mid = DpRelease.releaseCounts(
        spark.table("dp_cells"), Seq("source", "lang"), "v1")
        .as[(String, String, Long, Long)].collect().toMap2
      mem.addData(b2.toSeq)
      q.processAllAvailable()
      val fin = DpRelease.releaseCounts(
        spark.table("dp_cells"), Seq("source", "lang"), "v1")
        .as[(String, String, Long, Long)].collect().toMap2
      // the noise on any cell present in both releases is IDENTICAL
      // (sticky), so the released difference equals the true count
      // delta EXACTLY — this is the privacy FAILURE that rules naive
      // re-release out for evolving counts, kept here as executable
      // documentation of why continualCounts exists
      val trueMid = b1.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val trueFin = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      mid.keys.foreach { k =>
        assert(fin(k) - mid(k) ==
          trueFin.getOrElse(k, 0L) - trueMid.getOrElse(k, 0L),
          s"$k: sticky noise cancels in the difference — exact delta leak")
      }
      // a SINGLE publication is still deterministic and matches batch
      val batch = DpRelease.noisyCounts(
        rows.toSeq.toDF("source", "lang"), Seq("source", "lang"), "v1")
        .as[(String, String, Long, Long)].collect().toMap2
      assert(fin == batch, "one-shot streamed release diverges from batch")
    } finally q.stop()
  }

  test("tree-counter per-trigger release: batch parity per prefix, no exact-delta leak") {
    implicit val sqlCtx = spark.sqlContext
    val horizon = DpRelease.ContinualHorizon
    val all = Tables.events(spark, sf)
      .select(col("event_type"),
        datediff(col("ts").cast("date"),
          to_date(lit(DpRelease.ContinualEpoch0))).cast("long").as("t"))
      .filter(col("t") >= 0 && col("t") < horizon)
      .as[(String, Long)].collect()
    // the cell domain is a release constant here (public enumeration)
    val domain = all.map(_._1).distinct.sorted.toSeq.toDF("event_type")
    val batchRel = DpRelease.continualCounts(
      all.toSeq.toDF("event_type", "t"), Seq("event_type"), col("t"),
      horizon, "v1", Some(domain))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("event_type", "t")
      .writeStream.format("memory").queryName("dp_tree_rows")
      .outputMode(OutputMode.Append()).start()
    try {
      // epoch-ordered arrival: trigger k delivers epochs [10k, 10k+10)
      (0 until 3).foreach { k =>
        val batch = all.filter(r => r._2 >= 10 * k && r._2 < 10 * (k + 1))
        mem.addData(batch.toSeq)
        q.processAllAvailable()
        val upTo = 10L * (k + 1) - 1
        val streamed = DpRelease.continualCounts(
          spark.table("dp_tree_rows"), Seq("event_type"), col("t"),
          horizon, "v1", Some(domain))
          .filter(col("t") <= upTo)
          .as[(String, Long, Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        streamed.foreach { case (key, v) =>
          assert(v == batchRel(key),
            s"$key: per-trigger tree release diverges from batch prefix")
        }
        assert(streamed.size == domain.count() * (upTo + 1))
      }
    } finally q.stop()

    // published day-over-day deltas are NOT the exact true deltas:
    // consecutive prefixes decompose into DIFFERENT node sets, so
    // their noises do not cancel. Σ|published − true| > 0 across the
    // schedule (vanishing only if dozens of independent node draws
    // all coincide — not possible with these fixed md5 seeds).
    val trueDelta = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val leaks = (for {
      ty <- domain.as[String].collect()
      t <- 1L until horizon.toLong
    } yield {
      val pub = batchRel((ty, t)) - batchRel((ty, t - 1))
      math.abs(pub - trueDelta.getOrElse((ty, t), 0L))
    }).sum
    assert(leaks > 0, "tree releases reproduced every exact delta — noise missing")
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
