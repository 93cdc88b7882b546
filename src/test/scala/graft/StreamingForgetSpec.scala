package graft

import graft.sources.PostingsStore
import graft.streaming.StreamingForget
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingForgetSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streamed deletions across micro-batches equal one batch forget; replay is a no-op") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val del = docs.filter(col("doc_id") % 11 === 4).select(col("doc_id"))
    val delIds = del.as[Long].collect().sorted
    assert(delIds.length >= 4)
    val (d1, d2) = delIds.splitAt(delIds.length / 2)

    val dirStream = java.nio.file.Files.createTempDirectory("forget_s_").toString
    val dirBatch = java.nio.file.Files.createTempDirectory("forget_b_").toString
    PostingsStore.build(docs, dirStream)
    PostingsStore.build(docs, dirBatch)
    PostingsStore.forget(spark, dirBatch, del)

    val mem = MemoryStream[Long]
    val q = StreamingForget.postings(mem.toDF().toDF("doc_id"), dirStream)
    try {
      mem.addData(d1.toSeq); q.processAllAvailable()
      mem.addData(d2.toSeq); q.processAllAvailable()
      // at-least-once delivery: a replayed request batch must not
      // change the store (forget is idempotent by construction)
      mem.addData(d1.toSeq); q.processAllAvailable()
    } finally q.stop()

    val terms = Seq("the", "data", "model")
    val got = PostingsStore.search(spark, dirStream, terms, k = 30)
      .as[(Long, Long, Double)].collect().toSeq
    val want = PostingsStore.search(spark, dirBatch, terms, k = 30)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want, "streamed forget must equal the one-shot batch forget")
  }
}
