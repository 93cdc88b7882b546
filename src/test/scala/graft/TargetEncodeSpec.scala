package graft

import graft.operators.TargetEncode
import org.scalatest.funsuite.AnyFunSuite

class TargetEncodeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("singleton bucket collapses exactly to the global prior") {
    val rows = Seq(("lone", 999L)) ++ (0L until 9L).map(i => ("big", 100L))
    val out = TargetEncode.targetEncodeOf(rows.toDF("bucket", "y")).collect()
      .map(r => r.getAs[String]("bucket") -> r).toMap
    // mu = (999 + 900) / 10; LOO of the singleton sees only the prior
    val muMicro = (999L + 900L) * 1000000L / 10L
    assert(out("lone").getAs[Long]("loo_min_micro") == muMicro)
    assert(out("lone").getAs[Long]("loo_max_micro") == muMicro)
  }

  test("constant target: every encoding is exactly the constant") {
    val rows = for (b <- Seq("a", "b", "c"); _ <- 0 until 7) yield (b, 42L)
    val out = TargetEncode.targetEncodeOf(rows.toDF("bucket", "y")).collect()
    for (r <- out) {
      assert(r.getAs[Long]("te_naive_micro") == 42000000L)
      assert(r.getAs[Long]("te_smooth_micro") == 42000000L)
      assert(r.getAs[Long]("loo_min_micro") == 42000000L)
      assert(r.getAs[Long]("loo_max_micro") == 42000000L)
    }
  }

  test("LOO excludes the row's own target: spread reveals leakage") {
    // bucket with y in {0, 1000}: naive te sees both; each LOO
    // encoding excludes its own row and lands on opposite sides
    val rows = Seq(("hot", 0L), ("hot", 1000L)) ++
      (0L until 20L).map(_ => ("cold", 500L))
    val out = TargetEncode.targetEncodeOf(rows.toDF("bucket", "y")).collect()
      .map(r => r.getAs[String]("bucket") -> r).toMap
    val hot = out("hot")
    assert(hot.getAs[Long]("loo_min_micro") < hot.getAs[Long]("te_naive_micro"))
    assert(hot.getAs[Long]("loo_max_micro") > hot.getAs[Long]("te_naive_micro"))
    // the excluded-own-y direction: dropping y=1000 pulls te DOWN,
    // so the row with y=1000 gets the LOW encoding
    assert(hot.getAs[Long]("loo_max_micro") - hot.getAs[Long]("loo_min_micro")
      > 0L)
  }

  test("hand identity: smoothed te = (S_b*N + K*S)*1e6 div ((n_b+K)*N)") {
    val rows = Seq(("b1", 10L), ("b1", 20L), ("b2", 70L))
    val out = TargetEncode.targetEncodeOf(rows.toDF("bucket", "y")).collect()
      .map(r => r.getAs[String]("bucket") -> r).toMap
    val (n, s, k) = (3L, 100L, TargetEncode.K)
    val expB1 = (30L * n + k * s) * 1000000L / ((2L + k) * n)
    assert(out("b1").getAs[Long]("te_smooth_micro") == expB1)
    assert(out("b1").getAs[Long]("te_naive_micro") == 15000000L)
  }
}
