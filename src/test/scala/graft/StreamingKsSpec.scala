package graft

import java.sql.Timestamp
import graft.operators.Ks
import graft.streaming.StreamingKs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingKsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("stream-maintained cells equal the batch fold; KS detection equals batch ksDrift") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("ts"), col("value"))
    // the batch operator's split point: exact midpoint of the span —
    // reference arm = early half, streamed live arm = late half, so
    // streamed detection must reproduce batch ksDrift exactly
    val mid = ev.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts")))) / 2)
        .cast("long")).as[Long].head()
    val rows = ev.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    // exact microseconds (getTime truncates to ms — the StreamingPaths rule)
    def usOf(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val (early, late) = rows.partition(r => usOf(r._2) < mid)
    assert(early.nonEmpty && late.nonEmpty)

    val refCells = StreamingKs.cells(
      early.toSeq.toDF("event_type", "ts", "value"))

    val mem = MemoryStream[(String, Timestamp, Double)]
    val (l1, l2) = late.splitAt(late.length / 2)
    val q = StreamingKs.cells(mem.toDF().toDF("event_type", "ts", "value"))
      .writeStream.format("memory").queryName("ks_cells")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(l1.toSeq)
      q.processAllAvailable()
      mem.addData(l2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ks_cells")
    val batchCells = StreamingKs.cells(
      late.toSeq.toDF("event_type", "ts", "value"))
    assert(streamed.exceptAll(batchCells).isEmpty &&
      batchCells.exceptAll(streamed).isEmpty,
      "maintained cells differ from the batch fold")

    val got = StreamingKs.detect(refCells, streamed)
      .orderBy(col("event_type")).collect()
    val want = Ks.ksDrift(ev).orderBy(col("event_type")).collect()
    assert(got.toSeq == want.toSeq)

    // PSI off the SAME maintained state reproduces batch psiDrift
    val gotPsi = StreamingKs.detectPsi(refCells, streamed)
      .orderBy(col("event_type")).collect()
    val wantPsi = graft.operators.Psi.psiDrift(ev)
      .orderBy(col("event_type")).collect()
    assert(gotPsi.toSeq == wantPsi.toSeq)
  }
}
