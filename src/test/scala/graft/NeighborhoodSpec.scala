package graft

import graft.operators.{Hll, Neighborhood}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NeighborhoodSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("exact neighborhood on a path graph: N(t) counts pairs, eff diameter at 90%") {
    // directed path 0→1→2→3: N(0)=4, N(1)=7, N(2)=9, N(3)=10
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Neighborhood.neighborhoodExact(edges).orderBy(col("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.map(x => (x._1, x._2)).toSeq ==
      Seq((0L, 4L), (1L, 7L), (2L, 9L), (3L, 10L)))
    // fracs 0.4, 0.7, 0.9, 1.0 → effective diameter t = 2
    assert(out.map(_._3).toSeq == Seq(0, 0, 1, 0))
  }

  test("hyperball round-t registers ARE the sketch of the exact ball (lossless union)") {
    val edges = Tables.edges(spark, sf)
    val rounds = 3
    val hb = Neighborhood.hyperBall(edges, rounds).persist()
    val exact = Neighborhood.pairBalls(edges, rounds).persist()
    for (t <- 0 to rounds) {
      val balls = exact.filter(col("depth") <= t)
        .select(col("x").as("node"), col("node").as("member"))
      val direct = Hll.sketchBy(balls, "node", col("member"))
      val got = hb.filter(col("t") === t)
        .select(col("node"), col("bucket"), col("max_rho"))
      // register-identical, not estimate-close: max-merge of member
      // sketches ≡ sketch of the union
      assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty,
        s"round $t")
    }
    hb.unpersist(); exact.unpersist()
  }

  test("hyperball registers are round-monotone and the N(t) sum tracks exact") {
    val edges = Tables.edges(spark, sf)
    val rounds = 4
    val hb = Neighborhood.hyperBall(edges, rounds).persist()
    // registers never regress: the final round's table IS the
    // per-(node, bucket) max over all rounds (max-merge only grows)
    val fin = hb.filter(col("t") === rounds)
      .select(col("node"), col("bucket"), col("max_rho"))
    val best = hb.groupBy(col("node"), col("bucket"))
      .agg(max(col("max_rho")).as("max_rho"))
    assert(fin.exceptAll(best).isEmpty && best.exceptAll(fin).isEmpty)
    val est = Neighborhood.hyperBallEstimates(hb)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exactN = Neighborhood.pairBalls(edges, rounds)
      .groupBy(col("depth")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (t <- 0 to rounds) {
      val nt = (0L to t.toLong).map(exactN.getOrElse(_, 0L)).sum.toDouble
      val ht = est.collect { case ((tt, _), e) if tt == t => e }.sum
      // m = 64 → 13% per-node σ, and the per-node errors are
      // CORRELATED (every sketch hashes the same members with the
      // same function), so the |V|-node sum does NOT concentrate —
      // the bound is a single-sketch-grade one, worst near the
      // linear-counting/raw crossover (~2.5m)
      assert(math.abs(ht - nt) / nt < 0.25, s"t=$t exact=$nt est=$ht")
    }
  }
}
