package graft

import graft.operators.GTest
import org.scalatest.funsuite.AnyFunSuite

class GTestSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def expand(cells: Seq[(String, String, Int)]) =
    cells.flatMap { case (a, b, n) => Seq.fill(n)((a, b)) }
      .toDF("a", "b")

  private def g2Double(cells: Seq[(String, String, Int)]): Double = {
    val n = cells.map(_._3).sum.toDouble
    val r = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble)
    val c = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum.toDouble)
    2.0 * cells.map { case (a, b, o) =>
      if (o == 0) 0.0 else o * math.log(o * n / (r(a) * c(b)))
    }.sum
  }

  test("exact independence: G2 within micro-rounding of zero") {
    // o = r*c/n exactly for every cell (product design)
    val cells = for (a <- Seq("x", "y"); b <- Seq("p", "q", "s"))
      yield (a, b, if (a == "x") 20 else 40)
    val rows = GTest.gTestOf(expand(cells)).collect()
    val total = rows.head.getAs[Long]("g2_total_micro")
    val n = cells.map(_._3).sum
    // each L() rounds within 0.5 micro-nat; per-cell error <= 2*o*2
    assert(math.abs(total) <= 4L * n)
  }

  test("dependent 2x2 matches the double formula to micro precision") {
    val cells = Seq(("x", "p", 30), ("x", "q", 10),
      ("y", "p", 10), ("y", "q", 30))
    val rows = GTest.gTestOf(expand(cells)).collect()
    val total = rows.head.getAs[Long]("g2_total_micro")
    assert(math.abs(total / 1e6 - g2Double(cells)) < 1e-3)
    assert(rows.head.getAs[Long]("dof") == 1L)
    assert(total > 0L)
  }

  test("absent combinations contribute exactly zero (no dense grid)") {
    val cells = Seq(("x", "p", 25), ("x", "q", 5), ("y", "p", 10))
    val rows = GTest.gTestOf(expand(cells)).collect()
    assert(rows.length == 3) // only observed cells ride
    val total = rows.head.getAs[Long]("g2_total_micro")
    assert(math.abs(total / 1e6 - g2Double(cells)) < 1e-3)
    assert(rows.head.getAs[Long]("dof") == 1L) // still 2x2 of levels
  }

  test("per-cell terms sum to the ridden total") {
    val cells = Seq(("x", "p", 12), ("x", "q", 7), ("y", "p", 9),
      ("y", "q", 21))
    val rows = GTest.gTestOf(expand(cells)).collect()
    assert(rows.map(_.getAs[Long]("g_micro")).sum ==
      rows.head.getAs[Long]("g2_total_micro"))
  }
}
