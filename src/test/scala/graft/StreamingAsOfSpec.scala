package graft

import java.sql.Timestamp

import graft.streaming.{AsOfLeft, AsOfRight, StreamingAsOf}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingAsOfSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val t0 = 1700000000000L
  private def ts(offsetS: Long) = new Timestamp(t0 + offsetS * 1000)

  test("enriches with latest at-or-before right; equal-ts matches; no-prior is None") {
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[AsOfLeft]
    val rm = MemoryStream[AsOfRight]
    val q = StreamingAsOf.asOf(lm.toDS(), rm.toDS())
      .writeStream.format("memory").queryName("asof_t")
      .outputMode("append").start()
    try {
      rm.addData(AsOfRight(1L, ts(10), 100L), AsOfRight(1L, ts(30), 300L))
      lm.addData(AsOfLeft(1L, 1L, ts(20), 5.0), // between rights -> 100
        AsOfLeft(2L, 1L, ts(30), 6.0),          // equal instant -> 300
        AsOfLeft(3L, 1L, ts(5), 7.0),           // before all -> None
        AsOfLeft(4L, 2L, ts(50), 8.0))          // key with no rights -> None
      q.processAllAvailable()
      val got = spark.table("asof_t").as[graft.streaming.AsOfOut]
        .collect().map(o => o.event_id -> o.ref_id).toMap
      assert(got(1L) == Some(100L))
      assert(got(2L) == Some(300L))
      assert(got(3L) == None)
      assert(got(4L) == None)
    } finally q.stop()
  }

  test("late left still matches the right in force at its event time") {
    implicit val sqlCtx = spark.sqlContext
    val lm = MemoryStream[AsOfLeft]
    val rm = MemoryStream[AsOfRight]
    val q = StreamingAsOf.asOf(lm.toDS(), rm.toDS())
      .writeStream.format("memory").queryName("asof_late_t")
      .outputMode("append").start()
    try {
      // batch 1: two rights establish history
      rm.addData(AsOfRight(1L, ts(10), 100L), AsOfRight(1L, ts(100), 900L))
      q.processAllAvailable()
      // batch 2: a left BETWEEN them arrives late -> must match 100,
      // not the newer 900 a latest-state join would return
      lm.addData(AsOfLeft(1L, 1L, ts(50), 1.0))
      q.processAllAvailable()
      val got = spark.table("asof_late_t").as[graft.streaming.AsOfOut]
        .collect().map(o => o.event_id -> o.ref_id).toMap
      assert(got(1L) == Some(100L), s"late left must see the in-force right, got $got")
    } finally q.stop()
  }

  test("stream equals the batch as-of on in-order event data") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf)
    import org.apache.spark.sql.functions._
    val lefts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .as[AsOfLeft].collect().toSeq
    val rights = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("ref_id"))
      .as[AsOfRight].collect().toSeq
    val lm = MemoryStream[AsOfLeft]
    val rm = MemoryStream[AsOfRight]
    // watermark spanning the whole fixture timeline: nothing is late,
    // so every right is honored regardless of micro-batch placement
    val q = StreamingAsOf.asOf(lm.toDS(), rm.toDS(), watermarkDelay = "365 days")
      .writeStream.format("memory").queryName("asof_eq_t")
      .outputMode("append").start()
    try {
      // one micro-batch holding both sides: no right is late relative
      // to any left (and the initial watermark drops nothing); the
      // in-batch (ts, side, id) walk must reproduce the batch join
      rm.addData(rights)
      lm.addData(lefts)
      q.processAllAvailable()
      val stream = spark.table("asof_eq_t").as[graft.streaming.AsOfOut]
        .collect().map(o => o.event_id -> (o.ref_id, o.gap_us)).toMap
      val batch = graft.operators.TimeJoin.asOfJoinQuery(spark, sf)
        .select("event_id", "click_id", "gap_us")
        .as[(Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(stream.keySet == batch.keySet)
      assert(stream == batch, "stream enrichment must equal TimeJoin.asOfPrior")
    } finally q.stop()
  }
}
