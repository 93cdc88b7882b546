package graft

import graft.operators.Hits
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HitsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val S = Hits.HitsScale

  /** Sequential fixed-point reference mirroring the operator's integer
    * arithmetic exactly.
    */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var hub = nodes.map(_ -> S).toMap
    var auth = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      val ar = nodes.map(n =>
        n -> edges.filter(_._2 == n).map(e => hub(e._1)).sum).toMap
      val at = math.max(1L, ar.values.sum)
      auth = ar.map { case (n, r) => n -> (r * S) / at }
      val hr = nodes.map(n =>
        n -> edges.filter(_._1 == n).map(e => auth(e._2)).sum).toMap
      val ht = math.max(1L, hr.values.sum)
      hub = hr.map { case (n, r) => n -> (r * S) / ht }
    }
    nodes.map(n => n -> (auth(n), hub(n))).toMap
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Hits.hits(edges.toDF("src", "dst"), iters)
      .select(col("node"), col("auth"), col("hub"))
      .as[(Long, Long, Long)].collect()
      .map { case (n, a, h) => n -> (a, h) }.toMap

  test("star graph: all authority on the center, hubs on the spokes") {
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L))
    val r = run(star, 2)
    assert(r(0L)._1 == S, "center holds all authority")
    assert(r(0L)._2 == 0L, "center has no out-links: zero hub")
    Seq(1L, 2L, 3L).foreach { n =>
      assert(r(n)._1 == 0L)
      assert(r(n)._2 == S / 3)
    }
  }

  test("bit-parity with the sequential reference on an asymmetric graph") {
    val g = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 2L), (2L, 4L), (3L, 4L))
    assert(run(g, 3) == ref(g, 3))
  }

  test("normalization conserves mass within floor rounding") {
    val r = run(Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L)), 3)
    val authSum = r.values.map(_._1).sum
    val hubSum = r.values.map(_._2).sum
    assert(authSum <= S && authSum > S - r.size)
    assert(hubSum <= S && hubSum > S - r.size)
  }
}
