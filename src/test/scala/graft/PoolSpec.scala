package graft

import graft.operators.{Ann, Pool}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PoolSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("pooling identical members returns the member, micro-exact") {
    val v = Array(0.25f, -0.5f, 0.125f)
    val df = Seq((1L, v), (1L, v), (1L, v), (2L, Array(1f, 0f, 0f)))
      .toDF("doc", "embedding")
    val out = Pool.meanPool(df, "doc")
      .filter(col("k") === 1L).orderBy("dim")
      .select("mean").as[Double].collect()
    assert(out.toSeq == Seq(0.25, -0.5, 0.125))
  }

  test("micro fixed-point law: pooled mean equals the driver-side integer fold") {
    val rows = (0 until 50).map(i =>
      (i % 4.toLong, Array.tabulate(8)(j => ((i * 31 + j * 17) % 100) / 99.0f)))
    val df = rows.toDF("doc", "embedding")
    val got = Pool.meanPool(df, "doc")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    for (k <- 0L until 4L; d <- 0 until 8) {
      val vs = rows.filter(_._1 == k).map(_._2(d))
      val sumMicro = vs.map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong).sum
      val expect = math.floor(sumMicro.toDouble / 1e6 / vs.size * 1e6 + 0.5) / 1e6
      assert(got((k, d.toLong)) == expect, s"($k,$d)")
    }
  }

  test("pooledVectors round-trips into the ANN library") {
    val pooled = Pool.pooledVectors(Tables.embeddings(spark, sf), "label")
    assert(pooled.count() == 10)
    val nn = Ann.topKNeighbors(spark, pooled, pooled.limit(3), k = 2)
    assert(nn.count() > 0, "pooled vectors must be searchable")
    val dims = pooled.select(size(col("embedding"))).distinct().as[Int].collect()
    assert(dims.toSeq == Seq(64), "pooled vectors keep the corpus dim")
  }

  test("scale shape: one partial-agg groupBy, no joins") {
    val plan = Pool.meanPool(Tables.embeddings(spark, sf), "label")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "pooling must not join")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"))
  }
}
