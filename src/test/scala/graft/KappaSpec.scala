package graft

import graft.operators.Kappa
import org.scalatest.funsuite.AnyFunSuite

class KappaSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("perfect agreement: kappa exactly 1") {
    val pairs = Seq.fill(30)(("en", "en")) ++ Seq.fill(20)(("de", "de"))
    val r = Kappa.kappaOf(pairs.toDF("r1", "r2")).collect().head
    assert(r.getAs[Long]("po_micro") == 1000000L)
    assert(r.getAs[Long]("kappa_micro") == 1000000L)
  }

  test("majority-class rater: accuracy high, kappa exactly 0") {
    // truth is 80% en / 20% de; the second rater answers en always:
    // p_o = 0.8 but p_e = 0.8 too -> kappa = 0 (chance-corrected)
    val pairs = Seq.fill(80)(("en", "en")) ++ Seq.fill(20)(("de", "en"))
    val r = Kappa.kappaOf(pairs.toDF("r1", "r2")).collect().head
    assert(r.getAs[Long]("po_micro") == 800000L)
    assert(r.getAs[Long]("pe_micro") == 800000L)
    assert(r.getAs[Long]("kappa_micro") == 0L)
  }

  test("hand 2x2: kappa = (n*a - src) / (n^2 - src) exactly") {
    // conf: en/en 20, en/de 5, de/en 10, de/de 15 -> n=50, a=35
    // r = (25, 25), c = (30, 20), src = 25*30 + 25*20 = 1250
    val pairs = Seq.fill(20)(("en", "en")) ++ Seq.fill(5)(("en", "de")) ++
      Seq.fill(10)(("de", "en")) ++ Seq.fill(15)(("de", "de"))
    val r = Kappa.kappaOf(pairs.toDF("r1", "r2")).collect().head
    val (n, a, src) = (50L, 35L, 1250L)
    assert(r.getAs[Long]("kappa_micro") ==
      (n * a - src) * 1000000L / (n * n - src))
  }

  test("both raters constant and equal: p_e = 1, kappa NULL") {
    val pairs = Seq.fill(10)(("en", "en"))
    val r = Kappa.kappaOf(pairs.toDF("r1", "r2")).collect().head
    assert(r.getAs[Long]("pe_micro") == 1000000L)
    assert(r.isNullAt(r.fieldIndex("kappa_micro")))
  }

  test("systematic disagreement: kappa negative (worse than chance)") {
    val pairs = Seq.fill(25)(("en", "de")) ++ Seq.fill(25)(("de", "en"))
    val r = Kappa.kappaOf(pairs.toDF("r1", "r2")).collect().head
    assert(r.getAs[Long]("kappa_micro") < 0L)
  }
}
