package graft

import graft.operators.Linkage
import graft.streaming.StreamingLinkage
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingLinkageSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streamed linkage verdicts equal the batch link pair for pair") {
    implicit val sqlCtx = spark.sqlContext
    val house = Linkage.houseSide(spark, sf)
    val reg = Linkage.registry(spark, sf)
    // batch reference = the SAME stream-compatible pass pair; a second
    // assertion below ties it to the bounded batch blocking
    val batch = Linkage.linkedEqui(house, reg)
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean, Long, String)]
      .collect().toSet
    assert(batch.nonEmpty)
    // at fixture scale every cents block fits the SnBudget window, so
    // the bounded batch blocking and the stream-shaped equi blocking
    // produce identical scored pairs — the documented equivalence
    val bounded = Linkage.linked(house, reg)
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean, Long, String)]
      .collect().toSet
    assert(bounded == batch)

    val rows = reg.as[(Long, String, Long, String, Long)].collect()
    val (m1, m2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String, Long, String, Long)]
    val q = StreamingLinkage(
      mem.toDF().toDF("b_id", "b_name", "b_nation", "b_seg", "b_cents"), house)
      .writeStream.format("memory").queryName("linkage_t")
      .outputMode("append").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("linkage_t")
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean, Long, String)]
      .collect().toSet
    assert(streamed == batch)
  }
}
