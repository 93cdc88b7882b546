package graft

import graft.operators.Paths
import graft.streaming.{PEvent, StreamingPaths}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingPathsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streamed transition counts fold to the batch transition table") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf)
    val batch = Paths.transitions(ev)
      .select(col("from_type"), col("to_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    assert(batch.nonEmpty)

    val rows = ev.select(col("user_id"), col("event_id"), col("ts"),
      col("event_type")).as[PEvent].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val (m1, m2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[PEvent]
    val q = StreamingPaths.transitions(mem.toDS())
      .writeStream.format("memory").queryName("paths_t")
      .outputMode("append").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("paths_t")
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
  }
}
