package graft

import graft.operators.LinkPred
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkPredSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Sequential AA reference over an undirected edge list. */
  private def seqAA(edges: Set[(Long, Long)]): Map[(Long, Long), (Long, Long)] = {
    val und = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val w = nbrs.view.mapValues(n => n.size).toMap
      .collect { case (k, d) if d >= 2 =>
        k -> math.floor(1e6 / math.log(d.toDouble) + 0.5).toLong
      }
    val scores = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((c, wgt) <- w; u <- nbrs(c); v <- nbrs(c) if u < v) {
      val (n0, s0) = scores.getOrElse((u, v), (0L, 0L))
      scores((u, v)) = (n0 + 1, s0 + wgt)
    }
    scores.toMap.filter { case ((u, v), _) => !und.contains((u, v)) }
  }

  test("AA pairs and exact micro scores match the sequential reference on a hand graph") {
    // star around 1 (deg 4) + a rare shared neighbor 9 between 2 and 3
    val edges = Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (2L, 9L), (3L, 9L))
    val und = edges.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("a", "b")
    val got = LinkPred.adamicAdar(und, minCommon = 1)
      .select(col("u"), col("v"), col("n_common"), col("score_micro"))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (u, v, n, s) => (u, v) -> (n, s) }.toMap
    val want = seqAA(edges)
    assert(got == want)
    // (2,3) share hub 1 AND rare 9: its score strictly beats a pair
    // sharing only the hub
    assert(got((2L, 3L))._2 > got((2L, 4L))._2)
  }

  test("rare shared neighbors outweigh hubs (the 1/ln rationale)") {
    // hub h with many neighbors; x,y also share rare r
    val hubEdges = (1L to 20L).map(i => (100L, i)) ++ Seq((1L, 200L), (2L, 200L))
    val und = hubEdges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("a", "b")
    val got = LinkPred.adamicAdar(und, minCommon = 1)
      .select(col("u"), col("v"), col("score_micro"))
      .as[(Long, Long, Long)].collect()
      .map { case (u, v, s) => (u, v) -> s }.toMap
    // (1,2) shares hub(deg 20) + rare(deg 2); (3,4) shares only the hub
    assert(got((1L, 2L)) > got((3L, 4L)) * 2)
  }

  test("maxDeg drops hub centers: pairs sharing only a capped hub disappear") {
    val hubEdges = (1L to 20L).map(i => (100L, i)) ++ Seq((1L, 200L), (2L, 200L))
    val und = hubEdges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("a", "b")
    val capped = LinkPred.adamicAdar(und, minCommon = 1, maxDeg = 10)
      .select(col("u"), col("v")).as[(Long, Long)].collect().toSet
    // (1,2) keeps its rare center; (100,200) shares the two deg-2
    // spokes (legitimately under the cap); every pair whose ONLY
    // common neighbor was the capped hub is gone
    assert(capped((1L, 2L)))
    assert(!capped.exists { case (u, v) => u >= 3 && v >= 3 && v <= 20 },
      capped)
  }

  test("no predicted pair is already an edge, and the query's cut is totally ordered") {
    val rep = LinkPred.linkPred(spark, sf)
      .select(col("u"), col("v"), col("score_micro"))
      .as[(Long, Long, Long)].collect()
    assert(rep.nonEmpty && rep.length <= LinkPred.TopN)
    val e = Tables.edges(spark, sf).as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    rep.foreach { case (u, v, _) => assert(!e.contains((u, v))) }
    val sorted = rep.sortBy { case (u, v, s) => (-s, u, v) }.toSeq
    assert(rep.toSeq == sorted)
  }
}
