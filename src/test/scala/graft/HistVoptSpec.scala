package graft

import graft.operators.HistVopt
import org.scalatest.funsuite.AnyFunSuite

class HistVoptSpec extends AnyFunSuite {
  import SparkTestSession._

  test("buckets partition the span contiguously and cost the DP optimum") {
    val rows = HistVopt.histVopt(spark, sf).collect()
    assert(rows.length == HistVopt.Buckets)
    val sorted = rows.sortBy(_.getLong(0))
    // contiguous cover of [0, n)
    assert(sorted.head.getLong(1) == 0L)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(b.getLong(1) == a.getLong(2) + 1,
        "buckets must tile the span")
      case _ => ()
    }
    sorted.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1) + 1)
      assert(r.getLong(5) >= 0, "SSE is nonnegative")
    }
    // total = sum of per-bucket SSEs (one consistent lattice)
    assert(sorted.map(_.getLong(5)).sum == sorted.head.getLong(6))
    // mass conservation: bucket sums add to the corpus event count
    assert(sorted.map(_.getLong(4)).sum == Tables.events(spark, sf).count())
  }

  test("DP equals brute-force enumeration on the real series (B small)") {
    // recompute the series and enumerate all boundary placements
    import org.apache.spark.sql.functions._
    val sparse = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).cast("long").as("y"))
      .select(unix_micros(col("h")).as("hu"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lo = sparse.map(_._1).min
    val n = ((sparse.map(_._1).max - lo) / 3600000000L).toInt + 1
    val ys = Array.fill(n)(0L)
    sparse.foreach { case (hu, y) => ys(((hu - lo) / 3600000000L).toInt) = y }
    val s1 = ys.scanLeft(BigInt(0))(_ + _)
    val s2 = ys.scanLeft(BigInt(0))((a, y) => a + BigInt(y) * y)
    def sse(j: Int, i: Int): BigInt = {
      val d = s1(i) - s1(j)
      (s2(i) - s2(j)) * 1000000 - d * d * 1000000 / (i - j)
    }
    // brute force over 3 buckets on a PREFIX (keep the enumeration tiny)
    val m = math.min(n, 40)
    val best = (for {
      a <- 1 until m; b <- (a + 1) until m
    } yield sse(0, a) + sse(a, b) + sse(b, m)).min
    // DP over the same prefix, 3 buckets
    val dp1 = (1 to m).map(i => sse(0, i)).toArray
    val dp2 = (2 to m).map(i =>
      ((1 until i).map(j => dp1(j - 1) + sse(j, i))).min).toArray
    val dp3 = (3 to m).map(i =>
      ((2 until i).map(j => dp2(j - 2) + sse(j, i))).min).toArray
    assert(dp3(m - 3) == best, "DP must equal exhaustive enumeration")
  }

  test("a piecewise-constant series with Buckets segments recovers SSE 0 splits") {
    // handled through the same arithmetic (driver-side): 6 flat levels
    val levels = Seq.fill(5)(10L) ++ Seq.fill(7)(20L) ++ Seq.fill(4)(5L) ++
      Seq.fill(6)(40L) ++ Seq.fill(5)(1L) ++ Seq.fill(3)(99L)
    val s1 = levels.scanLeft(BigInt(0))(_ + _)
    val s2 = levels.scanLeft(BigInt(0))((a, y) => a + BigInt(y) * y)
    def sse(j: Int, i: Int): BigInt = {
      val d = s1(i) - s1(j)
      (s2(i) - s2(j)) * 1000000 - d * d * 1000000 / (i - j)
    }
    val n = levels.length
    val B = 6
    val dp = Array.ofDim[BigInt](B + 1, n + 1)
    for (i <- 1 to n) dp(1)(i) = sse(0, i)
    for (b <- 2 to B; i <- b to n)
      dp(b)(i) = ((b - 1) until i).map(j => dp(b - 1)(j) + sse(j, i)).min
    assert(dp(B)(n) == BigInt(0),
      "6 buckets over 6 flat levels must reach zero SSE")
  }
}
