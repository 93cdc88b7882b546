package graft

import graft.operators.Attribution
import graft.streaming.{AEvent, StreamingAttribution}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingAttributionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streamed journeys fold to the batch first/last attribution on ordered delivery") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf)

    val rows = ev.select(col("user_id"), col("event_id"), col("ts"),
      col("event_type")).as[AEvent].collect()
      .sortBy(e => (e.ts.getTime, e.event_id))
    val (m1, m2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[AEvent]
    val q = StreamingAttribution.journeys(mem.toDS())
      .writeStream.format("memory").queryName("attr_t")
      .outputMode("append").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("attr_t")

    // one journey per purchase
    val purchases = ev.filter(col("event_type") === "purchase").count()
    assert(streamed.count() == purchases)

    // the emitted journeys fold to exactly the batch operator's
    // first-touch / last-touch columns (counts merge by addition)
    val firstN = streamed.groupBy(col("first_type").as("event_type"))
      .agg(count(lit(1)).as("first_n"))
    val lastN = streamed.groupBy(col("last_type").as("event_type"))
      .agg(count(lit(1)).as("last_n"))
    val folded = firstN.join(lastN, Seq("event_type"), "full")
      .select(col("event_type"),
        coalesce(col("first_n"), lit(0L)).as("first_n"),
        coalesce(col("last_n"), lit(0L)).as("last_n"))
      .as[(String, Long, Long)].collect().toSet
    val batch = Attribution.attribution(ev)
      .select(col("event_type"), col("first_n"), col("last_n"))
      .as[(String, Long, Long)].collect()
      .filter(r => r._2 > 0 || r._3 > 0).toSet
    assert(folded == batch)
  }
}
