package graft

import java.sql.Timestamp
import graft.operators.Changepoint
import graft.streaming.StreamingChangepoint
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingChangepointSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("stream-maintained cells equal the batch fold; detector output identical") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1)))
    val (b1, b2) = rows.splitAt(rows.length / 2)

    val mem = MemoryStream[(String, Timestamp)]
    val q = StreamingChangepoint.cells(
      mem.toDF().toDF("event_type", "ts"))
      .writeStream.format("memory").queryName("cp_cells")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      mem.addData(b2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("cp_cells")
    val batchCells = Changepoint.cells(
      rows.toSeq.toDF("event_type", "ts"))
    assert(streamed.exceptAll(batchCells).isEmpty &&
      batchCells.exceptAll(streamed).isEmpty,
      "maintained cells differ from the batch fold")

    val a = Changepoint.detect(streamed).orderBy(col("event_type")).collect()
    val b = Changepoint.detect(batchCells).orderBy(col("event_type")).collect()
    assert(a.toSeq == b.toSeq)
  }
}
