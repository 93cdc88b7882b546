package graft

import graft.operators.RunsTest
import org.scalatest.funsuite.AnyFunSuite

class RunsTestSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(ys: Seq[Long]) =
    RunsTest.runsOf(ys.zipWithIndex.map { case (y, t) => (t.toLong, y) }
      .toDF("t", "y")).collect().head

  test("alternating series: too many runs, verdict alternating") {
    // distinct lows on even hours, distinct highs on odd hours
    val ys = (0 until 20).map(t => if (t % 2 == 0) t.toLong else 100L + t)
    val r = run(ys)
    assert(r.getAs[Double]("z") > 1.959964)
    assert(r.getAs[String]("verdict") == "alternating")
  }

  test("blocked series: two runs, verdict clustered") {
    val ys = (0 until 10).map(_.toLong) ++ (0 until 10).map(100L + _)
    val r = run(ys)
    assert(r.getAs[Long]("n_runs") == 2L)
    assert(r.getAs[Double]("z") < -1.959964)
    assert(r.getAs[String]("verdict") == "clustered")
  }

  test("constant series: everything ties the median, degenerate NULL") {
    val r = run(Seq.fill(12)(5L))
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.getAs[String]("verdict") == "degenerate")
  }

  test("median hits are dropped (the classic tie rule), counts exact") {
    // values 1..5: median 3 dropped; signs of 1,2,4,5 -> LLHH: 2 runs
    val r = run(Seq(1L, 2L, 3L, 4L, 5L))
    assert(r.getAs[Long]("n_hours") == 4L)
    assert(r.getAs[Long]("n_above") == 2L && r.getAs[Long]("n_below") == 2L)
    assert(r.getAs[Long]("n_runs") == 2L)
  }

  test("z matches the hand formula") {
    val ys = Seq(1L, 9L, 2L, 8L, 3L, 7L, 10L, 4L) // median-rank value dropped
    val r = run(ys)
    val (n, n1, n2, rr) = (r.getAs[Long]("n_hours"), r.getAs[Long]("n_above"),
      r.getAs[Long]("n_below"), r.getAs[Long]("n_runs"))
    val z = (rr * n - n - 2.0 * n1 * n2) /
      math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n - 1.0))
    assert(math.abs(r.getAs[Double]("z") - z) < 2e-6)
  }
}
