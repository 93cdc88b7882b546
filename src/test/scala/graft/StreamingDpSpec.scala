package graft

import graft.operators.DpRelease
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** DP release on a stream: the stream maintains the count cells (the
  * one aggregation Structured Streaming already does incrementally and
  * exactly); the per-trigger release is [[DpRelease.releaseCounts]]
  * over the maintained table. Sticky seeded noise is what makes the
  * streaming form DP-sound: every trigger re-releases the same cells
  * with the SAME noise, so a monitor publishing after each batch
  * spends one ε total instead of ε per trigger.
  */
class StreamingDpSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("per-trigger release off maintained cells equals the batch release, one eps total") {
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
      // (sticky): released difference equals the true count delta
      val trueMid = b1.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val trueFin = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      mid.keys.foreach { k =>
        assert(fin(k) - mid(k) ==
          trueFin.getOrElse(k, 0L) - trueMid.getOrElse(k, 0L),
          s"$k: noise must not re-draw across triggers")
      }
      // final streamed release == one-shot batch release
      val batch = DpRelease.noisyCounts(
        rows.toSeq.toDF("source", "lang"), Seq("source", "lang"), "v1")
        .as[(String, String, Long, Long)].collect().toMap2
      assert(fin == batch, "streamed release diverges from batch")
    } finally q.stop()
  }

  private implicit class Map2[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
