package graft

import graft.operators.{Components, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LabelPropSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Sequential synchronous LPA mirroring the operator exactly:
    * majority neighbor label, ties to smallest.
    */
  private def ref(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val nbrs = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var labels = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = nbrs.map { case (n, ns) =>
        val counts = ns.groupBy(labels).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
      }
    }
    labels
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    Graph.labelProp(edges.toDF("src", "dst"), rounds)
      .as[(Long, Long)].collect().toMap

  test("bridge between two triangles does NOT merge the communities") {
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    val labels = run(g, 3)
    assert(labels(0L) == labels(1L) && labels(1L) == labels(2L))
    assert(labels(3L) == labels(4L) && labels(4L) == labels(5L))
    assert(labels(0L) != labels(3L), "bridge must not merge communities")
    // connected components WOULD merge them — LPA is strictly finer here
    val cc = Components.fromPairs(g.toDF("a_id", "b_id"))
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1)
  }

  test("bit-parity with the sequential reference on a mixed graph") {
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L),
      (4L, 5L), (5L, 3L), (6L, 0L), (6L, 1L), (7L, 7L), (4L, 3L))
    assert(run(g, 3) == ref(g, 3))
  }

  test("query output: every node labeled once, csize consistent") {
    val out = Graph.labelPropQuery(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length == out.length, "one row per node")
    val byLabel = out.groupBy(_._2)
    byLabel.foreach { case (l, rows) =>
      assert(rows.forall(_._3 == rows.length), s"csize wrong for label $l")
    }
  }
}
