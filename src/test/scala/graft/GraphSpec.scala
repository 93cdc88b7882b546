package graft

import graft.operators.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def frame(edges: Seq[(Long, Long)]): DataFrame =
    edges.toDF("src", "dst")

  private def result(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] =
    Graph.triangles(frame(edges))
      .select(col("node"), col("deg"), col("n_tri"), col("cc"))
      .as[(Long, Long, Long, Double)]
      .collect().map { case (n, d, t, c) => n -> (d, t, c) }.toMap

  test("K4: every node in 3 triangles, cc = 1") {
    val k4 = for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)
    val r = result(k4)
    assert(r.keySet == Set(0L, 1L, 2L, 3L))
    r.values.foreach { case (deg, tri, cc) =>
      assert(deg == 3 && tri == 3 && cc == 1.0)
    }
  }

  test("path graph has zero triangles; isolated-from-triangle nodes kept") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val r = result(path)
    assert(r.size == 4)
    assert(r.values.forall(_._2 == 0L))
    assert(r(1L)._1 == 2 && r(1L)._3 == 0.0, "deg-2 path node: cc 0")
    assert(r(0L)._1 == 1 && r(0L)._3 == 0.0, "deg-1 node: cc defined as 0")
  }

  test("duplicate, reverse, and self-loop edges collapse") {
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val noisy = tri ++ tri.map(_.swap) ++ tri ++ Seq((0L, 0L), (5L, 5L))
    val clean = result(tri)
    assert(result(noisy).filter(_._2._1 > 0) == clean)
    clean.values.foreach { case (deg, t, cc) => assert(deg == 2 && t == 1 && cc == 1.0) }
  }

  test("matches brute-force count on the sf0.001 crawl graph") {
    val edges = Tables.edges(spark, sf)
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2))
    // brute force: every unordered node triple, all three edges present
    val triples = for {
      x <- nodes.toSeq.sorted; y <- nodes.toSeq.sorted if x < y
      if und.contains((x, y))
      z <- nodes.toSeq.sorted if y < z
      if und.contains((y, z)) && und.contains((x, z))
    } yield (x, y, z)
    val expectPerNode = triples.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val got = result(Tables.edges(spark, sf).as[(Long, Long)].collect().toSeq)
    nodes.foreach { n =>
      assert(got(n)._2 == expectPerNode.getOrElse(n, 0L), s"node $n")
    }
    assert(triples.nonEmpty, "fixture graph should actually contain triangles")
  }

  test("plan: no cartesian product / nested-loop join anywhere") {
    val plan = Graph.triangles(Tables.edges(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
