package graft

import graft.operators.Skyline
import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(pts: Seq[(String, Long, Long)]) =
    Skyline.skylineOf(pts.toDF("segment", "x", "y")).collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[Long]("x"),
        r.getAs[Long]("y"), r.getAs[Long]("n_points")))

  test("hand frontier: dominated interior points drop, duplicates count") {
    val out = run(Seq(
      ("s", 1L, 5L), ("s", 2L, 4L), ("s", 3L, 1L), ("s", 3L, 1L),
      ("s", 2L, 2L),  // dominated by (2,4) at the same x
      ("s", 1L, 3L))) // dominated by (2,4)
    assert(out.toSet == Set(("s", 3L, 1L, 2L), ("s", 2L, 4L, 1L),
      ("s", 1L, 5L, 1L)))
  }

  test("equal y at greater x dominates: only the greater-x point stays") {
    val out = run(Seq(("s", 5L, 7L), ("s", 3L, 7L)))
    assert(out.toSeq == Seq(("s", 5L, 7L, 1L)))
  }

  test("output is an anti-chain: no frontier point dominates another") {
    val pts = (0L until 200L).map(i =>
      ("s", (i * 37L) % 101L, (i * 53L) % 97L))
    val out = run(pts)
    for (a <- out; b <- out if a != b)
      assert(!(a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)),
        s"$a dominates $b")
    // frontier must contain the max-x and max-y points' coordinates
    assert(out.map(_._2).max == pts.map(_._2).max)
    assert(out.map(_._3).max == pts.map(_._3).max)
  }

  test("segments are independent frontiers") {
    val out = run(Seq(("a", 1L, 1L), ("b", 5L, 5L), ("a", 2L, 2L)))
    // (1,1) is dominated within a; b's lone point survives
    assert(out.toSet == Set(("a", 2L, 2L, 1L), ("b", 5L, 5L, 1L)))
  }
}
