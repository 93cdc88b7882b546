package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankQualitySpec extends AnyFunSuite {
  import SparkTestSession._

  test("exact vs itself is exactly 1; the probe ladder is NDCG-monotone in the mean") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Ann.norm(col("embedding")))
    val queries = e.filter(col("vec_id") % 100 === 0)
    val cents = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    val truth = Ann.topKNeighbors(spark, e, queries).persist()

    val self = Ann.ndcg(truth, truth).collect()
    assert(self.nonEmpty && self.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12))
    // short truth lists (n < k) still score exactly 1 on a perfect
    // match — idcg is per-query, not a fixed k-term constant
    val short = truth.filter(col("rank") <= 4)
    val shortSelf = Ann.ndcg(short, short, k = 10).collect()
    assert(shortSelf.nonEmpty &&
      shortSelf.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12))

    def meanNdcg(nprobe: Int): Double = {
      val approx = Ann.ivfSearch(spark, e, queries, cents, nprobe = nprobe)
      val rows = Ann.ndcg(truth, approx).collect().map(_.getDouble(1))
      rows.sum / rows.length
    }
    val n1 = meanNdcg(1); val n2 = meanNdcg(2); val n5 = meanNdcg(5)
    assert(n1 <= n2 + 1e-9 && n2 <= n5 + 1e-9, s"ladder $n1 $n2 $n5")
    assert(n5 > n1, "more probes must actually help on this fixture")
    assert(n1 > 0.0 && n5 <= 1.0 + 1e-12)
    truth.unpersist()
  }

  test("ndcgMicro: self scores exactly 1, tracks the double face, hits = recall numerator") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Ann.norm(col("embedding")))
    val queries = e.filter(col("vec_id") % 100 === 0)
    val truth = Ann.topKNeighbors(spark, e, queries).persist()
    val self = Ann.ndcgMicro(truth, truth).collect()
    assert(self.nonEmpty && self.forall(r => r.getDouble(2) == 1.0))
    assert(self.forall(r => r.getLong(1) == math.min(Ann.TopK,
      truth.filter(col("query_id") === r.getLong(0)).count())))
    val approx = Ann.ivf(spark, sf)
    val micro = Ann.ndcgMicro(truth, approx).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val dbl = Ann.ndcg(truth, approx).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(micro.keySet == dbl.keySet)
    // micro-rounded discount weights shift any score < ~1e-5
    micro.foreach { case (q, v) =>
      assert(math.abs(v - dbl(q)) < 1e-4, s"query $q: $v vs ${dbl(q)}")
    }
    truth.unpersist()
  }

  test("head inversion scores below tail truncation at equal recall") {
    import spark.implicits._
    // truth ranks 1..4; arm A returns them reversed (full recall),
    // arm B returns top-3 in order then garbage (recall 3/4)
    val truth = Seq((1L, 1L, 10L, 0.9), (1L, 2L, 11L, 0.8),
      (1L, 3L, 12L, 0.7), (1L, 4L, 13L, 0.6))
      .toDF("query_id", "rank", "vec_id", "cos_sim")
    val a = Seq((1L, 1L, 13L, 0.6), (1L, 2L, 12L, 0.7),
      (1L, 3L, 11L, 0.8), (1L, 4L, 10L, 0.9))
      .toDF("query_id", "rank", "vec_id", "cos_sim")
    val b = Seq((1L, 1L, 10L, 0.9), (1L, 2L, 11L, 0.8),
      (1L, 3L, 12L, 0.7), (1L, 4L, 99L, 0.1))
      .toDF("query_id", "rank", "vec_id", "cos_sim")
    val nA = Ann.ndcg(truth, a, k = 4).collect().head.getDouble(1)
    val nB = Ann.ndcg(truth, b, k = 4).collect().head.getDouble(1)
    assert(nA < nB, s"reversal $nA should lose to truncation $nB")
    assert(nA < 1.0 && nB < 1.0)
  }
}
