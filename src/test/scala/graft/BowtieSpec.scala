package graft

import graft.operators.Bowtie
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted bow-tie: every class represented, classification exact. */
class BowtieSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("planted bow-tie classifies every node correctly") {
    // core ring: 10 -> 11 -> 12 -> 10
    // in: 1 -> 10, 2 -> 1 (chain into the core)
    // out: 12 -> 20 -> 21 (chain out of the core)
    // tendril: 2 -> 40 (hangs off IN, no path to/from core)
    //          41 <- 20 is OUT-reachable so NOT a tendril — plant
    //          instead 42 -> 2's side branch 42 -> 40 (pure tendril)
    // disconnected: 50 <-> 51 (their own 2-ring elsewhere)
    val edges = Seq[(Long, Long)](
      (10L, 11L), (11L, 12L), (12L, 10L),
      (1L, 10L), (2L, 1L),
      (12L, 20L), (20L, 21L),
      (2L, 40L), (42L, 40L),
      (50L, 51L), (51L, 50L))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.toDF("id")
    val got = Bowtie.classify(nodes, edges.toDF("src", "dst"))
      .as[(Long, String)].collect().toMap
    val want = Map(
      10L -> "core", 11L -> "core", 12L -> "core",
      1L -> "in", 2L -> "in",
      20L -> "out", 21L -> "out",
      40L -> "tendril", 42L -> "tendril",
      50L -> "disconnected", 51L -> "disconnected")
    assert(got == want, s"diff=${got.toSet diff want.toSet}")
  }

  test("giant pick is deterministic: larger SCC wins, min id breaks ties") {
    // two 2-rings: {5,6} and {1,2} — same size, min scc id (1) wins
    val edges = Seq[(Long, Long)]((5L, 6L), (6L, 5L), (1L, 2L), (2L, 1L))
    val nodes = Seq(1L, 2L, 5L, 6L).toDF("id")
    val got = Bowtie.classify(nodes, edges.toDF("src", "dst"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "core" && got(2L) == "core")
    assert(got(5L) == "disconnected" && got(6L) == "disconnected")
  }
}
