package graft

import graft.operators.Ewma
import org.scalatest.funsuite.AnyFunSuite

class EwmaSpec extends AnyFunSuite {
  import SparkTestSession._

  test("corpus levels are positive, bounded by the series range, and mae is finite") {
    val rows = Ewma.ewmaQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val level = r.getAs[Long]("level_micro")
      assert(level >= 0L)
      assert(r.getAs[Double]("mae") >= 0.0)
      assert(r.getAs[Long]("n_hours") > 1L)
      // convexity: each step is a convex combination, so the level can
      // never exceed 1e6 × the max hourly count of the whole window
      assert(level <= 2000L * 1000000L)
    }
  }

  test("closed forms: constant series holds its level exactly; a step decays geometrically") {
    // replay the exact integer recursion (the operator's arithmetic)
    def fold(ys: Seq[Long]): Long = {
      var s = ys.head * 1000000L
      for (y <- ys.tail)
        s = (Ewma.AlphaNum * y * 1000000L +
          (Ewma.AlphaDen - Ewma.AlphaNum) * s) / Ewma.AlphaDen
      s
    }
    assert(fold(Seq.fill(50)(7L)) == 7000000L) // constant is a fixed point
    // 0→10 step: level approaches 10 monotonically from below
    val climb = (1 to 30).map(k => fold(Seq(0L) ++ Seq.fill(k)(10L)))
    assert(climb.zip(climb.tail).forall { case (a, b) => a < b })
    assert(climb.last > 9900000L && climb.last < 10000000L)
  }
}
