package graft

import java.sql.Timestamp

import graft.streaming.StreamingBoilerplate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingBoilerplateSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val t0 = 1700000000000L
  // one 8-word unit exactly (8 tokens)
  private val shared = "alpha beta gamma delta epsilon zeta eta theta"
  private val other = "one two three four five six seven eight"

  test("unit promotes once when it crosses the distinct-doc threshold") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingBoilerplate.boilerplate(
      mem.toDF().toDF("doc_id", "text", "ts"), minDocs = 3)
      .writeStream.format("memory").queryName("bp_t")
      .outputMode("append").start()
    try {
      // two distinct docs + one REPEAT sighting of doc 1: below threshold
      mem.addData((1L, shared, new Timestamp(t0)),
        (2L, shared, new Timestamp(t0 + 1000)),
        (1L, shared, new Timestamp(t0 + 1500)))
      q.processAllAvailable()
      assert(spark.table("bp_t").count() == 0, "2 distinct docs must not promote")
      // third distinct doc crosses the threshold
      mem.addData((3L, shared, new Timestamp(t0 + 2000)),
        (4L, other, new Timestamp(t0 + 2000)))
      q.processAllAvailable()
      val hits = spark.table("bp_t").select("unit", "n_docs_at_promotion")
        .as[(String, Long)].collect()
      assert(hits.toSeq == Seq((shared, 3L)), s"got ${hits.toSeq}")
      // later sightings do not re-emit (tombstone)
      mem.addData((5L, shared, new Timestamp(t0 + 3000)))
      q.processAllAvailable()
      assert(spark.table("bp_t").count() == 1, "promotion is emitted once")
    } finally q.stop()
  }

  test("streaming threshold agrees with the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, shared + " " + other),
      (2L, shared),
      (3L, other),
      (4L, "totally unrelated words that appear in just one document"))
    val batch = graft.operators.Scrub
      .boilerplateUnits(docs.toDF("doc_id", "text"), w = 8, minDocs = 2)
      .as[(String, Long)].collect().toMap
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingBoilerplate.boilerplate(
      mem.toDF().toDF("doc_id", "text", "ts"), minDocs = 2)
      .writeStream.format("memory").queryName("bp_t2")
      .outputMode("append").start()
    try {
      docs.zipWithIndex.foreach { case ((id, tx), i) =>
        mem.addData((id, tx, new Timestamp(t0 + i * 1000)))
      }
      q.processAllAvailable()
      val stream = spark.table("bp_t2").select("unit", "n_docs_at_promotion")
        .as[(String, Long)].collect().toMap
      assert(stream.keySet == batch.keySet,
        s"stream ${stream.keySet} vs batch ${batch.keySet}")
      // the promotion count is a LOWER BOUND on the batch total: the
      // stream stops counting at the threshold, the batch pass sees
      // every sighting — the ordering relation behind the field's
      // deliberately-different name, asserted rather than implied
      stream.foreach { case (unit, atPromotion) =>
        assert(atPromotion <= batch(unit),
          s"unit '$unit': promotion count $atPromotion exceeds batch total ${batch(unit)}")
        assert(atPromotion >= 2L, s"unit '$unit' promoted below the threshold")
      }
    } finally q.stop()
  }
}
