package graft

import graft.operators.TwoByTwo
import org.scalatest.funsuite.AnyFunSuite

class TwoByTwoSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def table(a: Int, b: Int, c: Int, d: Int) =
    (Seq.fill(a)((1L, 1L)) ++ Seq.fill(b)((1L, 0L)) ++
      Seq.fill(c)((0L, 1L)) ++ Seq.fill(d)((0L, 0L)))
      .toDF("exposed", "outcome")

  test("hand table: OR, RR, RD exact micro ratios") {
    // a=20 b=30 c=10 d=40: OR = 20*40/(30*10) = 8/3
    val r = TwoByTwo.twoByTwoOf(table(20, 30, 10, 40)).collect().head
    assert(r.getAs[Long]("or_micro") == 20L * 40L * 1000000L / (30L * 10L))
    // RR = (20/50)/(10/50) = 2
    assert(r.getAs[Long]("rr_micro") == 2000000L)
    assert(r.getAs[Long]("rd_micro") == 400000L - 200000L)
  }

  test("no association: OR exactly 1, ln OR 0, not significant") {
    val r = TwoByTwo.twoByTwoOf(table(25, 25, 25, 25)).collect().head
    assert(r.getAs[Long]("or_micro") == 1000000L)
    assert(r.getAs[Long]("ln_or_micro") == 0L)
    assert(r.getAs[Int]("significant_05") == 0)
  }

  test("strong harmful exposure: CI excludes zero, significant") {
    // exposed rarely convert, unexposed mostly do
    val r = TwoByTwo.twoByTwoOf(table(5, 95, 80, 20)).collect().head
    assert(r.getAs[Long]("or_micro") < 1000000L)
    assert(r.getAs[Long]("ci_hi_micro") < 0L)
    assert(r.getAs[Int]("significant_05") == 1)
  }

  test("zero cell: every ratio NULL, never a Haldane-corrected number") {
    val r = TwoByTwo.twoByTwoOf(table(10, 0, 5, 5)).collect().head
    for (cname <- Seq("or_micro", "rr_micro", "rd_micro", "ln_or_micro",
      "se_micro", "ci_lo_micro", "ci_hi_micro"))
      assert(r.isNullAt(r.fieldIndex(cname)), cname)
  }
}
