package graft

import graft.operators.GraphStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphStatsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("reciprocity and assortativity recount sequentially on the fixture graph") {
    val got = GraphStats.graphStats(spark, sf)
      .as[(Long, Long, Double, Double)].head()
    val edges = Tables.edges(spark, sf).as[(Long, Long)].collect()
    val eSet = edges.toSet
    val recip = edges.count(e => eSet((e._2, e._1)))
    assert(got._1 == edges.length && got._2 == recip)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got._3 == r6(recip.toDouble / edges.length))
    // sequential Pearson over the symmetrized degree pairs
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = sym.map(e => deg(e._1)); val ys = sym.map(e => deg(e._2))
    val m = sym.length.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val syy = ys.map(a => a * a).sum.toDouble
    val r = (m * sxy - sx * sy) / math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert(got._4 == r6(r), s"assortativity ${got._4} vs $r")
  }

  test("modularity: closed form on two disjoint triangles (Q = 1/2)") {
    // perfect split: m=6, per community m_c=3, D_c=6;
    // Q·4m² = 2·(4·6·3 − 36) = 72, Q = 72/144 = 0.5
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (11L, 12L), (12L, 13L), (11L, 13L))
    val q = GraphStats.modularityOf(tri.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].head()
    assert(q == ((6L, 2L, 72L, 0.5)), q.toString)
  }

  test("modularity on the fixture: labelprop communities beat random") {
    val q = GraphStats.modularity(spark, sf)
      .as[(Long, Long, Long, Double)].head()
    assert(q._2 >= 2, "thinned fixture holds several communities")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(q._4 == r6(q._3.toDouble / (4.0 * q._1 * q._1)),
      "modularity must equal its integer numerator over 4m^2")
    assert(q._4 > 0.0 && q._4 < 1.0,
      s"labelprop communities should beat random on the fixture: Q=${q._4}")
  }
}
