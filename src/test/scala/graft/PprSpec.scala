package graft

import graft.operators.{Crawl, Ppr}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PprSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("all-seeds PPR is bit-identical to global PageRank") {
    // with every node a seed, base = 0.15/N and start = 1/N — the
    // exact leaking-PageRank recursion; same materialization schedule,
    // so the fixed-point integers must agree bit-for-bit
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L),
      (4L, 5L), (5L, 3L), (1L, 4L), (6L, 0L)).toDF("src", "dst")
    val ppr = Ppr.personalizedPageRank(edges, lit(true))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pr = Crawl.pageRank(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr === pr)
  }

  test("nodes unreachable from the seed set hold exactly zero mass") {
    // seed component {0,1,2}; a disjoint 2-cycle {10,11} and a node 12
    // pointing INTO the seed component (12 -> 0) but unreachable from
    // it: teleport never lands outside the seeds, and no directed path
    // reaches 10/11/12, so their rank is EXACTLY 0 — the trust-rank
    // spam-damping property (not just "small")
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 10L), (12L, 0L)).toDF("src", "dst")
    val out = Ppr.personalizedPageRank(edges, col("node") < 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) === 0L)
    assert(out(11L) === 0L)
    assert(out(12L) === 0L)
    // seeds keep the teleport floor every round
    val base = (3L * Ppr.Scale) / (20L * 3L)
    assert(Seq(0L, 1L, 2L).forall(out(_) >= base))
    // total mass never exceeds the injected teleport + start mass
    assert(out.values.sum <= Ppr.Scale)
  }

  test("mass decays with distance from the seed on a directed chain") {
    // chain 0 -> 1 -> 2 -> 3 seeded at 0: each hop multiplies by 0.85
    // (single out-edge, no fan-in), so ranks strictly decrease
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Ppr.personalizedPageRank(edges, col("node") === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) > out(1L) && out(1L) > out(2L) && out(2L) > out(3L))
    assert(out(3L) > 0L) // reachable: nonzero after >= 3 rounds
  }
}
