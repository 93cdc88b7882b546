package graft

import graft.operators.EdgeSupport
import org.scalatest.funsuite.AnyFunSuite

class EdgeSupportSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[(Long, Long), Long] =
    EdgeSupport.edgeSupport(edges.toDF("src", "dst")).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Long]("support")).toMap

  test("triangle with a pendant: the pendant is the local bridge") {
    val r = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(r == Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (1L, 3L) -> 1L,
      (3L, 4L) -> 0L), s"$r")
  }

  test("K4: every edge sits in exactly 2 triangles") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val r = run(edges)
    assert(r.size == 6 && r.values.forall(_ == 2L), s"$r")
  }

  test("shared edge of two triangles carries support 2; direction and dups collapse") {
    // bowtie 1-2-3 and 2-3-4 sharing edge (2,3); edges fed with
    // duplicates and reversed orientation
    val r = run(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 2L),
      (3L, 4L), (4L, 2L), (2L, 2L)))
    assert(r((2L, 3L)) == 2L, s"$r")
    assert(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).forall(e => r(e) == 1L),
      s"$r")
    assert(r.size == 5, "self-loops and dup/reverse edges collapse")
  }
}
