package graft

import graft.operators.Closeness
import org.scalatest.funsuite.AnyFunSuite

class ClosenessSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def rows(edges: Seq[(Long, Long)], k: Int) =
    Closeness.closeness(edges.toDF("src", "dst"), k, maxDepth = 20)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("directed chain with all nodes as landmarks: exact closed forms") {
    // 0 -> 1 -> 2 -> 3; k covers every node, so the estimate IS exact
    val m = rows(Seq((0L, 1L), (1L, 2L), (2L, 3L)), k = 4)
    // node 3 is reached by 0 (d=3), 1 (d=2), 2 (d=1)
    assert(m(3L) == ((3L, 6L, 1000000L / 3 + 500000L + 1000000L, Some(500000L))))
    // node 0 is a source: nothing reaches it — zeros and NULL, never inf
    assert(m(0L) == ((0L, 0L, 0L, None)))
    // node 1: only 0 reaches it at d=1 -> closeness exactly 1e6
    assert(m(1L) == ((1L, 1L, 1000000L, Some(1000000L))))
  }

  test("disconnected components never leak distances across the cut") {
    // two disjoint 2-cycles; landmarks cover all 4 nodes
    val m = rows(Seq((0L, 1L), (1L, 0L), (10L, 11L), (11L, 10L)), k = 4)
    // each node is reached only by its cycle partner at d=1
    for (n <- Seq(0L, 1L, 10L, 11L))
      assert(m(n) == ((1L, 1L, 1000000L, Some(1000000L))), s"node $n: ${m(n)}")
  }

  test("fewer landmarks than nodes: reached counts are bounded by k") {
    // complete bidirectional triangle + a pendant sink
    val tri = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (0L, 2L), (2L, 0L),
      (2L, 3L))
    val m = rows(tri, k = 2)
    assert(m.values.forall(_._1 <= 2), m.toString)
    // the sink is reached by both landmarks (graph is strongly
    // connected upstream of it)
    assert(m(3L)._1 == 2L)
  }

  test("depth cap excludes nodes beyond it") {
    // a 5-chain with maxDepth 2: the far end is out of reach of root 0
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val dist = Closeness.landmarkDistances(edges,
      Seq(0L).toDF("root"), maxDepth = 2)
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(dist == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }
}
