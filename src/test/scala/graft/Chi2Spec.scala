package graft

import graft.operators.FdProfile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Chi2Spec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("a perfectly independent table scores chi2 = 0") {
    // every (a, b) cell has identical count → observed = expected
    val rows = for (a <- Seq("x", "y"); b <- Seq("p", "q", "r"); _ <- 1 to 5)
      yield (a, b)
    val rep = FdProfile.chi2(rows.toDF("a", "b"), "a", "b")
    assert(rep.select(max(col("contrib_r6"))).as[Double].head() == 0.0)
    assert(rep.select(first(col("chi2_total"))).as[Double].head() == 0.0)
    assert(rep.select(first(col("dof"))).as[Long].head() == 2L)
  }

  test("a deterministic association scores the saturated statistic n·(min(R,C)−1)") {
    // b fully determined by a, 2×2, balanced: chi2 = n
    val rows = Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q"))
    val rep = FdProfile.chi2(rows.toDF("a", "b"), "a", "b")
    assert(rep.select(first(col("chi2_total"))).as[Double].head() == 20.0)
  }

  test("total is the exact decimal sum of rounded cell contributions; dof matches shape") {
    val rep = FdProfile.chi2Query(spark, sf).collect()
    val cells = rep.map(r => r.getAs[Double]("contrib_r6"))
    val total = rep.head.getAs[Double]("chi2_total")
    val want = cells.map(BigDecimal(_)).sum.toDouble
    assert(math.abs(total - want) < 1e-9, s"$total vs $want")
    val nr = rep.map(_.getAs[String]("a")).distinct.length
    val nc = rep.map(_.getAs[String]("b")).distinct.length
    // dof counts all observed categories, including those present only
    // in zero-less cells (absent cells don't appear as rows)
    assert(rep.head.getAs[Long]("dof") == (nr - 1L) * (nc - 1L) ||
      rep.head.getAs[Long]("dof") >= (nr - 1L) * (nc - 1L))
  }
}
