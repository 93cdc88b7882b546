package graft

import graft.operators.Bootstrap
import org.scalatest.funsuite.AnyFunSuite

class BootstrapSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("Poisson(1) CDF ladder is the textbook one") {
    val cdf = Bootstrap.PoissonCdf
    assert(cdf.size == 6)
    assert(math.abs(cdf.head - math.exp(-1.0)) < 1e-15)
    assert(math.abs(cdf(1) - 2 * math.exp(-1.0)) < 1e-15)
    assert(cdf.last > 0.9994 && cdf.last < 1.0)
    assert(cdf == cdf.sorted, "thresholds must be monotone")
  }

  test("interval brackets the point mean and is well-ordered") {
    val rows = (1L to 400L).map(i => (i, 100L + i % 50)).toDF("id", "x")
    val r = Bootstrap.bootstrap(rows).collect().head
    val (n, reps, mean, lo, hi) = (r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_reps"), r.getAs[Long]("mean_micro"),
      r.getAs[Long]("lo_micro"), r.getAs[Long]("hi_micro"))
    assert(n == 400L && reps == Bootstrap.NumReps.toLong)
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket $mean")
    assert(lo < hi)
    // CI half-width should be of order sd/sqrt(n): sd(x)~14.4, n=400
    // => se ~0.72 => micro half-width < ~4 se
    assert(hi - lo < 4L * 720000L * 2, s"CI implausibly wide: ${hi - lo}")
  }

  test("interval narrows as n grows (the 1/sqrt(n) law, coarsely)") {
    def width(n: Long): Long = {
      val rows = (1L to n).map(i => (i, 100L + i % 50)).toDF("id", "x")
      val r = Bootstrap.bootstrap(rows).collect().head
      r.getAs[Long]("hi_micro") - r.getAs[Long]("lo_micro")
    }
    val (w100, w1600) = (width(100L), width(1600L))
    assert(w1600 * 2 < w100,
      s"16x the data must shrink the CI well past 2x: $w100 -> $w1600")
  }

  test("constant data yields a degenerate interval at the constant") {
    val rows = (1L to 200L).map(i => (i, 42L)).toDF("id", "x")
    val r = Bootstrap.bootstrap(rows).collect().head
    assert(r.getAs[Long]("mean_micro") == 42000000L)
    assert(r.getAs[Long]("lo_micro") == 42000000L)
    assert(r.getAs[Long]("hi_micro") == 42000000L)
  }
}
