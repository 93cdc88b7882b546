package graft

import graft.operators.Crawl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("hub of a star graph out-ranks every spoke; ranks are deterministic") {
    // spokes 1..6 all link to hub 0; hub links back to spoke 1
    val edges = ((1L to 6L).map(s => (s, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val pr = Crawl.pageRank(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(pr.size == 7)
    val hub = pr(0L)
    (2L to 6L).foreach(s => assert(hub > pr(s), s"hub must out-rank spoke $s"))
    // spoke 1 receives the hub's whole rank — it beats the other spokes
    assert(pr(1L) > pr(2L))
    // fixed-point determinism: a second run is bit-identical
    val again = Crawl.pageRank(edges, iters = 5).as[(Long, Long)].collect().toMap
    assert(again == pr)
    // total rank mass never exceeds the initial mass (dangling leak
    // only removes): sum <= N * SCALE/N
    assert(pr.values.sum <= 7L * (Crawl.PrScale / 7L))
  }

  test("conserveDangling keeps Σpr a distribution within fixed-point rounding") {
    // node 7 is DANGLING (receives from 0, emits nothing): the default
    // form leaks its damped mass every round, the conserving form
    // spreads it uniformly
    val edges = ((1L to 6L).map(s => (s, 0L)) ++ Seq((0L, 1L), (0L, 7L)))
      .toDF("src", "dst")
    val n = 8L
    val init = n * (Crawl.PrScale / n)
    val leak = Crawl.pageRank(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    val keep = Crawl.pageRank(edges, iters = 5, conserveDangling = true)
      .as[(Long, Long)].collect().toMap
    // each round floors a handful of integer divisions (≤ a few units
    // per node/edge, out of 1e12 per unit mass) — conservation holds
    // to well under a millionth
    assert(math.abs(keep.values.sum - init) < 1000000L,
      s"conserving Σpr drifted: ${keep.values.sum} vs $init")
    // the default really does leak (this graph has real dangling mass)
    assert(leak.values.sum < keep.values.sum - Crawl.PrScale / 100L,
      "leaking form should lose visible mass on a dangling graph")
    // on this graph the uniform top-up leaves the ranking untouched
    // (it can shift orderings in general — that's why the flag exists
    // only for consumers of absolute VALUES)
    val ord = (m: Map[Long, Long]) => m.toSeq.sortBy(r => (-r._2, r._1)).map(_._1)
    assert(ord(leak) == ord(keep), "dangling redistribution reordered this fixture")
    // determinism of the conserving form
    val again = Crawl.pageRank(edges, iters = 5, conserveDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(again == keep)
  }
}
