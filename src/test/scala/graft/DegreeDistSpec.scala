package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DegreeDistSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("degrees match brute force; zero-degree sides are kept") {
    // 1->2, 1->3, 2->3: node 1 has in 0, node 3 has out 0
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val m = Graph.degrees(edges)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m == Map(1L -> (2L, 0L), 2L -> (1L, 1L), 3L -> (0L, 2L)))
  }

  test("histogram accounts for every node on both axes") {
    val out = Graph.degreeDistQuery(spark, sf)
      .as[(Long, Long, Long)].collect()
    val nodes = Graph.degrees(Tables.edges(spark, sf)).count()
    assert(out.map(_._2).sum == nodes, "out-degree axis covers all nodes")
    assert(out.map(_._3).sum == nodes, "in-degree axis covers all nodes")
    assert(out.map(_._1).distinct.length == out.length, "one row per degree")
  }
}
