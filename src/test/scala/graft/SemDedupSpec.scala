package graft

import graft.operators.{Ann, SemDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // Two tight semantic groups plus a loner, all in one cluster cell:
  // ids 1,2,3 are near-copies of e1; ids 10,11 near-copies of e2;
  // id 20 is orthogonal. One centroid so the within-cell rule is
  // exercised alone.
  private def fixture = {
    def v(base: Array[Float], eps: Float, dim: Int): Array[Float] = {
      val c = base.clone(); c(dim) = c(dim) + eps; c
    }
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val e3 = Array(0f, 0f, 1f, 0f)
    Seq(
      (1L, v(e1, 0.01f, 1)), (2L, v(e1, 0.02f, 2)), (3L, v(e1, 0.03f, 3)),
      (10L, v(e2, 0.01f, 2)), (11L, v(e2, 0.02f, 3)),
      (20L, e3)
    ).toDF("vec_id", "embedding")
  }

  private def cents = Seq((0L, Array(0.5f, 0.5f, 0.5f, 0.1f)))
    .toDF("cent_id", "c_emb")
    .withColumn("c_nrm", Ann.norm(col("c_emb")))
    .select(col("cent_id"), col("c_emb"), col("c_nrm"))

  test("triangular rule: one survivor per semantic group, loner kept") {
    val out = SemDedup.dedup(fixture, cents, tau = 0.95)
      .orderBy("vec_id").collect()
    val dups = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val kept = out.filterNot(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(out.length == 6)
    // each group keeps exactly one member; the loner survives
    assert(kept.contains(20L))
    assert((kept - 20L).size == 2, s"one survivor per group, got $kept")
    assert(dups.size == 3)
    assert(Set(1L, 2L, 3L).count(kept) == 1)
    assert(Set(10L, 11L).count(kept) == 1)
  }

  test("keep rule is the paper's: the cluster-edge member survives") {
    val out = SemDedup.dedup(fixture, cents, tau = 0.95).collect()
    val byId = out.map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    for (group <- Seq(Set(1L, 2L, 3L), Set(10L, 11L))) {
      val survivor = group.filterNot(byId(_)._2)
      val minCos = group.map(byId(_)._1).min
      assert(survivor.size == 1)
      assert(byId(survivor.head)._1 == minCos,
        s"survivor of $group must have the lowest cent_cos")
    }
  }

  test("tau sweeps: above any cosine nothing drops; at -1 one per cell") {
    val none = SemDedup.dedup(fixture, cents, tau = 1.01)
    assert(none.filter(col("is_dup")).count() == 0)
    val all = SemDedup.dedup(fixture, cents, tau = -1.0)
    assert(all.filter(!col("is_dup")).count() == 1,
      "tau=-1 collapses each cell to its priority-first member")
  }

  test("scale shape: assignment rides the scan, pair join salted") {
    val e = Tables.embAug(spark, sf)
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Ann.norm(col("embedding")))
    val cs = base.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    val plan = SemDedup.dedup(e, cs).queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "within-cell pair join must be salted")
    assert(!plan.contains("CartesianProduct"), "no all-pairs anywhere")
    // the assignment itself is the broadcast-argmax kernel, not a join
    assert(plan.toLowerCase.contains("nearestcentroids"),
      "assignment must use the shuffle-free argmax kernel")
  }

  test("q_semdedup finds every injected duplicate copy") {
    val out = SemDedup.semdedup(spark, sf)
    // Tables.embAug injects an identical copy (id+1e6) of every
    // vec_id % 20 == 0 row; cos(copy, original) = 1 >= tau, so one of
    // each such pair must be flagged.
    val flagged = out.filter(col("is_dup")).count()
    val injected = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 20 === 0).count()
    assert(flagged >= injected,
      s"expected at least $injected dups (the injected copies), got $flagged")
  }
}
