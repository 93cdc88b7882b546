package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KcoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Boolean] =
    Graph.kcore(edges.toDF("src", "dst"), k = k)
      .as[(Long, Boolean)].collect().toMap

  test("clique survives, tendril cascades out over two rounds") {
    // K4 {1,2,3,4}; star node 5 -> {6,7,8}: 6,7,8 have degree 1 and
    // peel round 1, which drops 5 from degree 3 to 0 — round-2 cascade
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 6L), (5L, 7L), (5L, 8L))
    val r = core(edges, k = 3)
    assert(Seq(1L, 2L, 3L, 4L).forall(r(_)), "K4 is the 3-core")
    assert(Seq(5L, 6L, 7L, 8L).forall(n => !r(n)),
      "star must cascade out — a one-shot degree filter would keep 5")
  }

  test("matches a sequential peel-to-fixpoint reference") {
    // deterministic pseudo-random sparse graph
    val edges = (0 until 120).map { i =>
      val a = (i * 37 + 11) % 40
      val b = (i * 53 + 7) % 40
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }
    def seqKcore(es: Seq[(Long, Long)], k: Int): Set[Long] = {
      val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      var alive = und.flatMap { case (a, b) => Seq(a, b) }
      var changed = true
      while (changed) {
        val deg = und.toSeq.filter { case (a, b) => alive(a) && alive(b) }
          .flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val next = alive.filter(n => deg.getOrElse(n, 0) >= k)
        changed = next != alive
        alive = next
      }
      alive
    }
    val want = seqKcore(edges, 3)
    val got = core(edges, 3).filter(_._2).keySet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("k=1 keeps every non-isolated node; huge k empties the core") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
    assert(core(edges, 1).values.forall(identity))
    assert(core(edges, 10).values.forall(!_))
  }

  test("fixture query peels some nodes and keeps a core") {
    val r = Graph.kcoreQuery(spark, sf).as[(Long, Boolean)].collect()
    assert(r.nonEmpty)
    // weak structural assertion: output covers all thinned-graph nodes
    // exactly once, flags are booleans (content is oracle-checked)
    assert(r.map(_._1).distinct.length == r.length)
  }
}
