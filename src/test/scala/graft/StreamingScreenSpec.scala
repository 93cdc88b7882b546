package graft

import graft.functions.{Bloom, TextSim}
import graft.operators.Corpus
import graft.streaming.StreamingScreen
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingScreenSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streamed bloom screen equals the batch screen doc for doc") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val evalDocs = docs.filter(col("doc_id") % Corpus.EvalMod === 0)
    val trainDocs = docs.filter(col("doc_id") % Corpus.EvalMod =!= 0)

    val batch = Corpus.contaminationBloom(trainDocs, evalDocs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(batch.nonEmpty)

    // the filter is the static artifact: built once from the eval set
    val f = Bloom.fit(
      evalDocs.select(TextSim.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(explode(TextSim.shingles3(col("t"))).as("shingle")),
      "shingle", 1 << 17)

    val rows = trainDocs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val (m1, m2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingScreen(mem.toDF().toDF("doc_id", "text"), f)
      .writeStream.format("memory").queryName("screen_t")
      .outputMode("append").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("screen_t")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(streamed == batch,
      s"stream/batch screen diverges (e.g. ${(streamed -- batch).take(3)})")
  }
}
