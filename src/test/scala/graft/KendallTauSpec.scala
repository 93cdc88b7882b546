package graft

import graft.operators.KendallTau
import org.scalatest.funsuite.AnyFunSuite

class KendallTauSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("perfectly concordant series: tau = 1") {
    val cells = (0L until 10L).map(t => (t, t, t * 3L)).toDF("t", "x", "y")
    val r = KendallTau.kendallOfCells(cells).collect().head
    assert(r.getAs[Long]("n_pairs") == 45L)
    assert(r.getAs[Long]("concordant") == 45L)
    assert(r.getAs[Long]("discordant") == 0L)
    assert(r.getAs[Double]("tau_b") == 1.0)
    assert(r.getAs[String]("agreement") == "concordant")
  }

  test("perfectly reversed series: tau = -1") {
    val cells = (0L until 10L).map(t => (t, t, 9L - t)).toDF("t", "x", "y")
    val r = KendallTau.kendallOfCells(cells).collect().head
    assert(r.getAs[Double]("tau_b") == -1.0)
    assert(r.getAs[String]("agreement") == "discordant")
  }

  test("tie-adjusted hand case: tau-b = 0.5") {
    // pairs: (0,1) ties x, (0,2) concordant, (1,2) ties y
    // tau-b = (1-0)/sqrt((3-1)*(3-1)) = 0.5
    val cells = Seq((0L, 1L, 1L), (1L, 1L, 2L), (2L, 2L, 2L))
      .toDF("t", "x", "y")
    val r = KendallTau.kendallOfCells(cells).collect().head
    assert(r.getAs[Long]("concordant") == 1L)
    assert(r.getAs[Long]("discordant") == 0L)
    assert(r.getAs[Long]("tie_x") == 1L && r.getAs[Long]("tie_y") == 1L)
    assert(r.getAs[Double]("tau_b") == 0.5)
  }

  test("one constant series: zero radicand, tau NULL, degenerate") {
    val cells = (0L until 5L).map(t => (t, 4L, t)).toDF("t", "x", "y")
    val r = KendallTau.kendallOfCells(cells).collect().head
    assert(r.isNullAt(r.fieldIndex("tau_b")))
    assert(r.getAs[String]("agreement") == "degenerate")
  }

  test("volume-up breadth-flat bot burst reads independent, not concordant") {
    // x ramps, y alternates around a flat level: inversions cancel
    val cells = (0L until 12L).map(t => (t, t * 10L, 5L + (t % 2)))
      .toDF("t", "x", "y")
    val r = KendallTau.kendallOfCells(cells).collect().head
    assert(math.abs(r.getAs[Double]("tau_b")) <= 0.2)
    assert(r.getAs[String]("agreement") == "independent")
  }
}
