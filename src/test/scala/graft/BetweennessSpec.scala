package graft

import graft.operators.Betweenness
import org.scalatest.funsuite.AnyFunSuite

class BetweennessSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Sequential reference: distance-bounded pivot Brandes on the same
    * integer lattice (walk-count forward pass, floor-div backward).
    */
  private def seqBtw(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val acc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (p <- nodes if p % Betweenness.PivotMod == 0) {
      // forward: walks per depth; sigma = walks at first reach
      var layer = Map(p -> 1L)
      val dist = scala.collection.mutable.Map(p -> 0)
      val sigma = scala.collection.mutable.Map(p -> 1L)
      for (d <- 1 to Betweenness.MaxDepth) {
        val next = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for ((u, w) <- layer; v <- adj.getOrElse(u, Seq.empty)) next(v) += w
        for ((v, w) <- next if !dist.contains(v)) { dist(v) = d; sigma(v) = w }
        layer = next.toMap
      }
      // backward: integer-lattice dependency accumulation
      val delta = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for (d <- (Betweenness.MaxDepth - 1) to 1 by -1;
        v <- dist.keys if dist(v) == d) {
        var s = 0L
        for (w <- adj.getOrElse(v, Seq.empty)
          if dist.get(w).contains(d + 1))
          s += Math.floorDiv(sigma(v) * (1000000L + delta(w)), sigma(w))
        if (s != 0L) { delta(v) = s; acc(v) += s }
      }
    }
    nodes.map(n => n -> acc(n)).toMap
  }

  private def got(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Betweenness.betweenness(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand-computed chain: brokerage decays toward the far end") {
    // 0 -> 1 -> 2 -> 3 -> 4, pivot {0}: delta(1)=3e6, delta(2)=2e6,
    // delta(3)=1e6, endpoints 0
    val g = got(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    assert(g == Map(0L -> 0L, 1L -> 3000000L, 2L -> 2000000L,
      3L -> 1000000L, 4L -> 0L))
  }

  test("hand-computed diamond: split geodesics halve the dependency") {
    // 0 -> {1,2} -> 3: sigma(3) = 2, so delta(1) = delta(2) =
    // (1 * 1e6) div 2 = 500000
    val g = got(Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)))
    assert(g(1L) == 500000L && g(2L) == 500000L)
    assert(g(0L) == 0L && g(3L) == 0L)
  }

  test("parity with the sequential reference on a multi-pivot fixture") {
    // pivots 0, 10, 20; cycles, fan-ins, a dead end, nodes beyond the
    // distance bound from some pivots
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 10L), (10L, 3L), (3L, 4L), (4L, 20L),
      (20L, 5L), (5L, 0L), (1L, 10L), (10L, 4L), (2L, 4L), (5L, 6L),
      (6L, 7L), (7L, 8L), (20L, 6L), (0L, 9L), (9L, 10L), (3L, 20L))
    assert(got(edges) == seqBtw(edges))
  }

  test("distance bound is live: a 5-hop-only broker scores zero") {
    // 0 -> a -> b -> c -> d -> e: node d sits only on the 5-hop
    // geodesic 0..e, beyond MaxDepth = 4 — bounded betweenness 0
    val g = got(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(g(4L) == 0L)
    assert(g(3L) == 1000000L) // still brokers the 4-hop pair (0,4)
  }
}
