package graft

import java.sql.Timestamp
import graft.operators.IntervalUnion
import graft.streaming.{IuEvent, StreamingIntervalUnion}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingIntervalUnionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("shuffled multi-batch replay finalizes exactly the batch sweep's spans") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"))
      .collect().map(r => IuEvent(r.getLong(0), r.getLong(1), r.getTimestamp(2)))
      .sortBy(_.ts.getTime)
    // three contiguous time chunks, each internally shuffled (order
    // inside a micro-batch is arbitrary; watermark moves between them)
    val chunks = rows.grouped((rows.length + 2) / 3).toSeq
      .map(_.sortBy(e => e.event_id % 7))
    // sentinel far past the horizon drains every real span
    val maxTs = rows.last.ts.getTime
    val flush = IuEvent(-1L, -1L, new Timestamp(maxTs + 3600 * 1000))

    val mem = MemoryStream[IuEvent]
    val q = StreamingIntervalUnion.spans(mem.toDS())
      .writeStream.format("memory").queryName("iu_spans")
      .outputMode("append").start()
    try {
      chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
      mem.addData(Seq(flush)); q.processAllAvailable()
      mem.addData(Seq(IuEvent(-1L, -2L,
        new Timestamp(maxTs + 7200 * 1000)))); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("iu_spans")
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // sequential batch sweep over the same events
    val expect = rows.groupBy(_.user_id).flatMap { case (u, es) =>
      def us(t: java.sql.Timestamp): Long =
        (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
      val iv = es.sortBy(e => (us(e.ts), e.event_id))
        .map(e => (us(e.ts), us(e.ts) + IntervalUnion.WindowUs))
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
      var s0 = iv.head._1; var e1 = iv.head._2; var n = 1L
      for ((s, e) <- iv.tail) {
        if (s > e1) { out += ((u, s0, e1, n)); s0 = s; e1 = e; n = 1L }
        else { n += 1L; if (e > e1) e1 = e }
      }
      out += ((u, s0, e1, n))
      out
    }.toSet
    assert(streamed == expect)
  }

  test("insert bridges two open spans and merges their counts") {
    import StreamingIntervalUnion.insert
    import graft.streaming.IuState
    val st0 = insert(insert(IuState(Nil, Nil, Nil), 0L, 10L), 20L, 30L)
    assert(st0.starts == List(0L, 20L) && st0.ends == List(10L, 30L))
    val bridged = insert(st0, 5L, 25L)
    assert(bridged.starts == List(0L) && bridged.ends == List(30L))
    assert(bridged.counts == List(3L))
    // touching merges (the batch strict-> rule)
    val touch = insert(IuState(List(0L), List(10L), List(1L)), 10L, 20L)
    assert(touch.starts == List(0L) && touch.ends == List(20L))
  }
}
