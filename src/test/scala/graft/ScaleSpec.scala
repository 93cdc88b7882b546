package graft

import java.sql.Timestamp

import graft.operators.Skew
import graft.streaming.{DocIn, StreamingDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("salted join equals plain join on a skewed dataset") {
    // 10k rows of one hot key + a tail
    val big = spark.range(10000).select(
      when(col("id") < 9000, 1L).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val small = Seq((1L, "hot"), (9500L, "cold"), (42L, "unmatched-on-big"))
      .toDF("k", "v")
    val plain = big.join(small, Seq("k")).select("k", "payload", "v")
      .as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 8)
      .select("k", "payload", "v").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 9000)
  }

  test("bucketed manifest join is shuffle-free (both sides pre-bucketed on id)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.manifest(spark, sf).write.mode("overwrite")
        .bucketBy(8, "id").sortBy("id").saveAsTable("m_bucketed")
      Tables.currentSnapshot(spark, sf).write.mode("overwrite")
        .bucketBy(8, "id").sortBy("id").saveAsTable("c_bucketed")
      val joined = spark.table("c_bucketed")
        .join(spark.table("m_bucketed"), Seq("id"), "left_outer")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == Tables.currentSnapshot(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("streaming dedup keeps first copy per hash across batches") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    def doc(id: Long, h: String, offMs: Long) = DocIn(id, h, new Timestamp(t0 + offMs))
    val mem = MemoryStream[DocIn]
    val q = StreamingDedup.dedup(mem.toDS())
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      mem.addData(doc(1, "aaa", 0), doc(2, "aaa", 10), doc(3, "bbb", 20))
      q.processAllAvailable()
      // second batch: more copies of aaa/bbb plus a fresh hash
      mem.addData(doc(4, "aaa", 30), doc(5, "bbb", 40), doc(6, "ccc", 50))
      q.processAllAvailable()
      val got = spark.table("dedup_t").as[DocIn].collect()
        .map(d => d.content_hash -> d.doc_id).toMap
      assert(got == Map("aaa" -> 1L, "bbb" -> 3L, "ccc" -> 6L))
    } finally q.stop()
  }
}
