package graft

import graft.operators.RatioMetric
import org.scalatest.funsuite.AnyFunSuite

class RatioMetricSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Sequential delta-method oracle over per-user (x, y) pairs. */
  private def delta(us: Seq[(Long, Long)]): (Double, Double) = {
    val n = us.length.toDouble
    val sx = us.map(_._1).sum.toDouble
    val sy = us.map(_._2).sum.toDouble
    val r = sy / sx
    def v(f: ((Long, Long)) => Double, g: ((Long, Long)) => Double) =
      (us.map(u => f(u) * g(u)).sum - us.map(f).sum * us.map(g).sum / n) / (n - 1)
    val se = math.sqrt(math.max(
      (v(_._2.toDouble, _._2.toDouble) - 2 * r * v(_._1.toDouble, _._2.toDouble)
        + r * r * v(_._1.toDouble, _._1.toDouble)) / n, 0.0)) / (sx / n)
    (r, se)
  }

  private def round6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("se matches the sequential delta-method oracle per arm") {
    val a = Seq((3L, 600L), (1L, 150L), (5L, 1100L), (2L, 380L))
    val b = Seq((2L, 500L), (2L, 480L), (4L, 1010L))
    val users = (a.map(u => ("A", u._1, u._2)) ++ b.map(u => ("B", u._1, u._2)))
      .toDF("variant", "x", "y")
    val got = RatioMetric.fromUsers(users).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((arm, us) <- Seq("A" -> a, "B" -> b)) {
      val (r, se) = delta(us)
      assert(got(arm).getAs[Double]("ratio") == round6(r), s"$arm ratio")
      assert(got(arm).getAs[Double]("se") == round6(se), s"$arm se")
      assert(got(arm).getAs[Double]("ci_lo") ==
        round6(r - RatioMetric.ZAlpha * se), s"$arm ci_lo")
      assert(got(arm).getAs[Double]("ci_hi") ==
        round6(r + RatioMetric.ZAlpha * se), s"$arm ci_hi")
    }
  }

  test("constant per-user ratio has zero clustering variance") {
    // y_u = 100·x_u exactly for every user: residuals y − R̂x are all
    // zero, so the delta-method se is EXACTLY 0. The moments are
    // chosen so every /n division is exact in doubles (sx=6, sy=600:
    // sx²/n, sy²/n, sx·sy/n all integers) — the zero is bit-exact,
    // not a rounding artifact.
    val users = Seq(("A", 1L, 100L), ("A", 2L, 200L), ("A", 3L, 300L))
      .toDF("variant", "x", "y")
    val r = RatioMetric.fromUsers(users).collect().head
    assert(r.getAs[Double]("ratio") == 100.0)
    assert(r.getAs[Double]("se") == 0.0)
    assert(r.getAs[Double]("ci_lo") == 100.0)
    assert(r.getAs[Double]("ci_hi") == 100.0)
  }

  test("clustering matters: heavy-user concentration widens se vs even split") {
    // same totals (sx=8, sy=1200) but one user holds most of the mass:
    // per-event analysis would call these identical; the delta method
    // must not
    val even = Seq(("A", 2L, 300L), ("A", 2L, 300L), ("A", 2L, 300L), ("A", 2L, 300L))
    val skew = Seq(("A", 5L, 1050L), ("A", 1L, 50L), ("A", 1L, 50L), ("A", 1L, 50L))
    val seEven = RatioMetric.fromUsers(even.toDF("variant", "x", "y"))
      .collect().head.getAs[Double]("se")
    val seSkew = RatioMetric.fromUsers(skew.toDF("variant", "x", "y"))
      .collect().head.getAs[Double]("se")
    assert(seEven == 0.0)
    assert(seSkew > 0.0)
  }

  test("degenerate arms report NULL inference (n=1 or sx=0)") {
    val users = Seq(("A", 3L, 600L), ("B", 0L, 0L), ("B", 0L, 0L))
      .toDF("variant", "x", "y")
    val got = RatioMetric.fromUsers(users).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("A").isNullAt(got("A").fieldIndex("se"))) // n=1
    assert(got("B").isNullAt(got("B").fieldIndex("ratio"))) // sx=0
    assert(got("B").isNullAt(got("B").fieldIndex("se")))
  }
}
