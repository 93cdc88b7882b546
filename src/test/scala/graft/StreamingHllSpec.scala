package graft

import graft.operators.Hll
import graft.streaming.StreamingHll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingHllSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def batchRegs(ids: Seq[Long]): Map[Long, Int] =
    Hll.sketch(ids.toDF("id"), col("id"))
      .select(col("bucket"), col("max_rho"))
      .as[(Long, Int)].collect().toMap

  test("streamed registers equal the one-shot batch sketch; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val all = (0L until 4000L) ++ (1000L until 5000L) // overlap across batches
    val (b1, b2) = (all.take(4000), all.drop(4000))

    val counter = new StreamingHll.Counter()
    val mem = MemoryStream[Long]
    val q = StreamingHll.ingest(mem.toDF().toDF("id"), col("id"), counter)
    try {
      mem.addData(b1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      val afterStream = counter.registers
      assert(afterStream == batchRegs(all), "stream must equal one-shot sketch")

      // replay: same data again — per-bucket max is idempotent, so the
      // at-least-once window costs nothing (no commit markers needed)
      mem.addData(b1 ++ b2)
      q.processAllAvailable()
      assert(counter.registers == afterStream, "replay moved the registers")
    } finally q.stop()

    // estimate arithmetic matches the batch read of the same registers
    val est = Hll.estimate(Hll.sketch(all.toDF("id"), col("id")))
    assert(math.abs(counter.estimate - est) < 1e-9)
    val truth = all.distinct.size.toDouble
    assert(math.abs(counter.estimate - truth) / truth < 0.4,
      s"est ${counter.estimate} vs $truth (m=64: 3 sigma ~ 39%)")
  }
}
