package graft

import graft.operators.Bootstrap
import graft.streaming.StreamingBootstrap
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingBootstrapSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("CI over stream-merged accumulators equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (b1, b2) = rows.splitAt(rows.length / 3)

    val mem = MemoryStream[(Long, Long)]
    val interval = new StreamingBootstrap.Interval
    val q = StreamingBootstrap.ingest(
      mem.toDF().toDF("id", "x"), interval)
    mem.addData(b1.toSeq)
    q.processAllAvailable()
    mem.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()

    val batch = Bootstrap.bootstrap(
      Tables.documents(spark, sf)
        .select(col("doc_id").as("id"), col("n_chars").cast("long").as("x")))
      .collect().head
    val expected = (batch.getAs[Long]("n_docs"), batch.getAs[Long]("n_reps"),
      batch.getAs[Long]("mean_micro"), batch.getAs[Long]("lo_micro"),
      batch.getAs[Long]("hi_micro"))
    assert(interval.report.contains(expected),
      s"stream ${interval.report} != batch $expected")
  }

  test("report before any observed batch is None, not a crash") {
    val interval = new StreamingBootstrap.Interval
    assert(interval.report.isEmpty)
  }
}
