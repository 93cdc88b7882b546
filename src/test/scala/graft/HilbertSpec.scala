package graft

import graft.sources.Hilbert
import org.scalatest.funsuite.AnyFunSuite

class HilbertSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Sequential reference xy→d (the classic rotate-and-fold loop). */
  private def ref(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  private def codes(bits: Int, pts: Seq[(Long, Long)]): Map[(Long, Long), Long] =
    Hilbert.withHilbert(pts.toDF("x", "y"), bits)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("h"))
      .toMap

  test("unrolled column rounds equal the sequential reference on the full 16x16 grid") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = codes(4, pts)
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ref(4, x, y), s"($x,$y)")
    }
  }

  test("hilbert is a bijection onto [0, 4^bits) and every step is adjacent") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = codes(4, pts)
    assert(got.values.toSeq.sorted == (0L until 256L)) // bijection
    // the curve property morton lacks: consecutive codes are GRID
    // neighbors (|Δx| + |Δy| = 1), every single step
    val byD = got.toSeq.map { case (xy, d) => d -> xy }.sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step ($x1,$y1)->($x2,$y2) not adjacent")
    }
  }

  test("the report finds hilbert fragments query boxes less than morton") {
    // the Moon et al. guarantee is about RUNS PER BOX, not mean code
    // jump (measured: morton wins the jump metric on these keys) —
    // verified externally: 839 hilbert runs vs 858 morton over 64
    // boxes at sf0.001
    val r = Hilbert.hilbertReport(spark, "/root/testdata/sf0.001")
      .collect().head
    assert(r.getAs[Long]("n_boxes") > 0L)
    assert(r.getAs[Long]("runs_h_micro") < r.getAs[Long]("runs_z_micro"))
    assert(r.getAs[Boolean]("hilbert_better"))
  }
}
