package graft

import graft.operators.{Dq, MultiMatch}
import graft.streaming.StreamingDq
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDqSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("accumulated stream states yield the one-shot distributive verdicts") {
    implicit val sqlCtx = spark.sqlContext
    val statePath = java.nio.file.Files.createTempDirectory("dqstate").toString + "/s"
    val docs = Dq.dirtyDocs(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, Option[String], Long)].collect()
    val (m1, m2) = docs.splitAt(docs.length / 3)
    val mem = MemoryStream[(Long, Option[String], Long)]
    val q = StreamingDq.attach(
      mem.toDF().toDF("doc_id", "lang", "n_chars"), statePath)
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = StreamingDq.verdicts(spark, statePath)
      .as[(String, Double, Double, Boolean)].collect().toSet
    val oneShot = Dq.suite(Dq.dirtyDocs(spark, sf),
      Tables.lineitem(spark, sf), Tables.orders(spark, sf))
      .filter(col("check_name").isin("completeness_lang", "range_n_chars",
        "volume_min_rows"))
      .as[(String, Double, Double, Boolean)].collect().toSet
    assert(streamed == oneShot,
      s"merged stream state must reproduce the batch verdicts: $streamed vs $oneShot")
    // two state rows landed (one per micro-batch) and merged by addition
    assert(spark.read.parquet(statePath).count() == 2)
  }

  test("streamed multimatch equals the batch matcher doc for doc") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val (m1, m2) = docs.splitAt(docs.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = MultiMatch.matches(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text")
      .writeStream.format("memory").queryName("mm_t")
      .outputMode("append").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("mm_t")
      .as[(Long, String, Long)].collect().toSet
    val batch = MultiMatch.matches(Tables.documents(spark, sf),
      "doc_id", "text").as[(Long, String, Long)].collect().toSet
    assert(streamed == batch)
  }
}
