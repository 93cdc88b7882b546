package graft

import java.sql.Timestamp

import graft.streaming.StreamingMinhash
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingMinhashSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val t0 = 1700000000000L
  private val textA = "the quick brown fox jumps over the lazy dog again and again today"
  private val textB = textA + " extra"          // near dup of A
  private val textC = "completely different words about spark shuffles and parquet scans here"

  test("streaming minhash emits candidate pairs across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingMinhash.candidates(
      mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("mh_t")
      .outputMode("append").start()
    try {
      mem.addData((1L, textA, new Timestamp(t0)), (3L, textC, new Timestamp(t0 + 1000)))
      q.processAllAvailable()
      assert(spark.table("mh_t").count() == 0, "no dups yet")
      // near-dup arrives in a LATER batch -> pairs with resident doc 1
      mem.addData((2L, textB, new Timestamp(t0 + 2000)))
      q.processAllAvailable()
      val pairs = spark.table("mh_t")
        .select("a_id", "b_id").distinct()
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"expected (1,2) in $pairs")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
        "unrelated doc must not pair")
    } finally q.stop()
  }

  test("bucket cap bounds pair fan-out for a viral bucket") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingMinhash.candidates(
      mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("mh_cap_t")
      .outputMode("append").start()
    try {
      // 40 identical docs: every band bucket saturates at MaxBucket
      val docs = (1L to 40L).map(i => (i, textA, new Timestamp(t0 + i)))
      mem.addData(docs: _*)
      q.processAllAvailable()
      val perBucket = spark.table("mh_cap_t")
        .groupBy("bucket").count().as[(String, Long)].collect()
      assert(perBucket.nonEmpty)
      // resident set capped at MaxBucket -> per bucket at most
      // sum_{k<cap}(k) + (n-cap)*cap pairs, far below n*(n-1)/2 = 780
      val cap = StreamingMinhash.MaxBucket
      val n = 40
      val maxPairs = cap * (cap - 1) / 2 + (n - cap) * cap
      perBucket.foreach { case (_, c) => assert(c <= maxPairs, s"$c > $maxPairs") }
    } finally q.stop()
  }
}
