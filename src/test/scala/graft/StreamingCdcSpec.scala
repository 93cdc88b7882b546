package graft

import graft.operators.Cdc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC chunking on the ingest stream: the chunker is a stateless
  * per-row projection (cut decisions depend only on the row's own
  * words), so the SAME code path serves batch and streaming — chunk
  * identities minted on the stream match the batch corpus exactly,
  * which is what lets a streaming ingest upsert into the chunk-keyed
  * vector store without a reconciliation pass.
  */
class StreamingCdcSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streamed CDC chunks equal batch chunks row for row") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val batch = Cdc.chunks(docs)
      .as[(Long, Long, Long, String, String)].collect().toSet
    assert(batch.nonEmpty)

    val rows = docs.as[(Long, String)].collect()
    val (m1, m2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = Cdc.chunks(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cdc_t")
      .outputMode("append").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cdc_t")
      .as[(Long, Long, Long, String, String)].collect().toSet
    assert(streamed == batch, "stream/batch chunk identities diverge")
  }
}
