package graft

import graft.operators.Blocklist
import graft.streaming.StreamingBlocklist
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingBlocklistSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streamed blocklist screen equals the batch screen doc for doc") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val batch = Blocklist.screen(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_hits"), col("n_terms"),
        col("keep_strict"), col("keep_soft"))
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toSet
    assert(batch.nonEmpty)

    val rows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val (m1, m2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingBlocklist(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("blocklist_t")
      .outputMode("append").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("blocklist_t")
      .select(col("doc_id"), col("n_hits"), col("n_terms"),
        col("keep_strict"), col("keep_soft"))
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toSet
    assert(streamed == batch)
  }
}
