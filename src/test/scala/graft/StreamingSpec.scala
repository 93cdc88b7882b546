package graft

import java.sql.Timestamp

import graft.operators.Analytics
import graft.streaming.{SEvent, StreamingHourly, StreamingSessionize}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streaming hourly matches the batch mirror on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect().toSeq
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(rows)
    val q = StreamingHourly.hourly(mem.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly_t")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("hourly_t")
      .select("hour", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val want = Analytics.eventsHourly(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == want)
  }

  test("the fused curation filter runs unchanged on a document stream") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis
      .filterSignals(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("filter_t")
      .outputMode("append").start()
    try {
      // two micro-batches: the per-row projection is batch-invariant
      val (b1, b2) = rows.splitAt(rows.length / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("filter_t")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val batch = graft.operators.TextAnalysis.filterMask(spark, sf)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(streamed == batch && batch.nonEmpty)
  }

  test("pii scrub runs unchanged on a document stream") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "write to a.b@example.com or 10.1.2.3 now"),
      (2L, "call +1-555-0100 twice"),
      (3L, "clean text with no pii"))
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.Scrub
      .scrubbedDocs(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("scrub_t")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(2)); q.processAllAvailable()
      mem.addData(rows.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("scrub_t")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val batch = graft.operators.Scrub.scrubbedDocs(rows.toDF("doc_id", "text"))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(streamed == batch)
    assert(streamed(1L) == "write to <EMAIL> or <IP> now")
    assert(streamed(2L) == "call <PHONE> twice")
    assert(streamed(3L) == "clean text with no pii")
  }

  test("streaming sessionize closes sessions on 30-min gaps across batches") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L // ms
    def ev(id: Long, offsetMin: Long, v: Double) =
      SEvent(1L, id, new Timestamp(t0 + offsetMin * 60000), v)
    val mem = MemoryStream[SEvent]
    val q = StreamingSessionize.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_t")
      .outputMode("append").start()
    try {
      // batch 1: two events 10 min apart -> one open session
      mem.addData(ev(1, 0, 1.5), ev(2, 10, 2.5))
      q.processAllAvailable()
      assert(spark.table("sess_t").count() == 0, "session must stay open")
      // batch 2: event 120 min later -> gap closes session 1 inline
      mem.addData(ev(3, 120, 4.0))
      q.processAllAvailable()
      // one more batch so the watermark (120min - 10min) finalizes append output
      mem.addData(ev(4, 125, 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess_t").as[graft.streaming.SessionRow]
        .collect().sortBy(_.start_us)
      assert(sessions.length >= 1)
      val s1 = sessions.head
      assert(s1.n_events == 2 && s1.sum_value == 4.0)
      assert(s1.first_event == 1 && s1.last_event == 2)
    } finally q.stop()
  }

  test("streaming sessionize emits timed-out session without new events for the user") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val mem = MemoryStream[SEvent]
    val q = StreamingSessionize.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_timeout_t")
      .outputMode("append").start()
    try {
      mem.addData(SEvent(7L, 1, new Timestamp(t0), 3.0))
      q.processAllAvailable()
      // another user's much-later event advances the watermark past
      // user 7's last+30min -> user 7's session times out and closes
      mem.addData(SEvent(8L, 2, new Timestamp(t0 + 3 * 3600000), 1.0))
      q.processAllAvailable()
      mem.addData(SEvent(8L, 3, new Timestamp(t0 + 3 * 3600000 + 60000), 1.0))
      q.processAllAvailable()
      val u7 = spark.table("sess_timeout_t").as[graft.streaming.SessionRow]
        .collect().filter(_.user_id == 7L)
      assert(u7.length == 1 && u7.head.n_events == 1 && u7.head.sum_value == 3.0)
    } finally q.stop()
  }
}
