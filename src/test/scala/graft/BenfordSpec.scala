package graft

import graft.operators.Benford
import org.scalatest.funsuite.AnyFunSuite

class BenfordSpec extends AnyFunSuite {
  import SparkTestSession._

  test("probability literals are log10(1+1/d) micro-rounded, summing to ~1") {
    assert(Benford.PMicro.head == 301030L) // log10(2)
    assert(Benford.PMicro(8) == 45757L)    // log10(10/9)
    val s = Benford.PMicro.sum
    assert(math.abs(s - 1000000L) <= 5, s"digit probs must sum to ~1e6: $s")
  }

  test("first-digit extraction and chi2 on the real corpus") {
    val rows = Benford.benford(spark, sf).collect()
    assert(rows.length == 9)
    assert(rows.map(_.getString(0)).toSeq == (1 to 9).map(_.toString))
    val n = rows.map(_.getLong(1)).sum
    assert(n == Tables.orders(spark, sf).count())
    // one total on every row; verdict consistent with it
    val totals = rows.map(_.getLong(5)).distinct
    assert(totals.length == 1)
    rows.foreach { r =>
      assert((r.getLong(5) > Benford.Chi2CritMicro) == (r.getInt(6) == 1))
    }
    // every contribution nonnegative and bounded by the total
    assert(rows.map(_.getLong(4)).forall(c => c >= 0 && c <= totals.head))
  }

  test("chi2 contribution arithmetic survives the decimal lattice") {
    // hand check one digit: obs=n, exp_micro=total*p ->
    // contrib = (n*1e6 - exp)^2 / exp, integer-truncated
    val rows = Benford.benford(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val n = r.getLong(1)
      val exp = BigInt(total) * r.getLong(3)
      val diff = BigInt(n) * 1000000 - exp
      assert(BigInt(r.getLong(4)) == diff * diff / exp,
        s"digit ${r.getString(0)} contribution mismatch")
    }
  }
}
