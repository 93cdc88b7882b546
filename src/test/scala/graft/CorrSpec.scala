package graft

import graft.operators.Corr
import org.scalatest.funsuite.AnyFunSuite

class CorrSpec extends AnyFunSuite {
  import SparkTestSession._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("sequential exact-cents recompute parity; r in [-1, 1]; known structure holds") {
    val got = Corr.corrQuery(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.values.flatten.forall(r => r >= -1.0 && r <= 1.0))
    // the synthetic measures are drawn independently — every |r| must
    // be near zero, which is itself the profile's signal (no derived
    // columns among the four)
    assert(got.values.flatten.forall(r => math.abs(r) < 0.1), got)

    // brute recompute in exact cents (BigInt moments)
    val rows = Tables.table(spark, sf, "lineitem")
      .selectExpr("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .collect().map(r => Array(
        math.floor(r.getDouble(0) * 100 + 0.5).toLong,
        math.floor(r.getDouble(1) * 100 + 0.5).toLong,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong,
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val n = BigInt(rows.length)
    for (Seq(i, j) <- (0 until 4).combinations(2)) {
      val sx = rows.map(r => BigInt(r(i))).sum
      val sy = rows.map(r => BigInt(r(j))).sum
      val sxx = rows.map(r => BigInt(r(i)) * BigInt(r(i))).sum
      val syy = rows.map(r => BigInt(r(j)) * BigInt(r(j))).sum
      val sxy = rows.map(r => BigInt(r(i)) * BigInt(r(j))).sum
      val num = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
      val va = n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
      val vb = n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble
      val expect = if (va > 0 && vb > 0) Some(r6(num / math.sqrt(va * vb))) else None
      assert(got((names(i), names(j))) == expect, s"${names(i)}-${names(j)}")
    }
  }
}
