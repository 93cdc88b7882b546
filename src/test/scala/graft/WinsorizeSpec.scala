package graft

import graft.operators.Winsorize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WinsorizeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("sequential order-statistic recompute parity on the corpus") {
    val got = Winsorize.winsorizeQuery(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(4),
        r.getDouble(5), r.getDouble(6)))).toMap
    val rows = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    for ((tpe, grp) <- rows.groupBy(_._1)) {
      val sorted = grp.sortBy(e => (e._3, e._2)).map(_._3)
      val n = sorted.length
      val k = n / 10
      val lo = sorted(k)         // rank k+1, 0-indexed
      val hi = sorted(n - k - 1) // rank n-k
      val win = sorted.map(v => math.max(math.min(v, hi), lo))
      val trim = sorted.slice(k, n - k)
      val (gn, gMean, gWin, gTrim) = got(tpe)
      assert(gn == n.toLong, tpe)
      assert(gMean == r6(sorted.map(BigInt(_)).sum.toDouble / (n * 100.0)), tpe)
      assert(gWin == r6(win.map(BigInt(_)).sum.toDouble / (n * 100.0)), tpe)
      assert(gTrim == r6(trim.map(BigInt(_)).sum.toDouble / (trim.length * 100.0)), tpe)
      // robustness direction: the winsorized/trimmed centers sit
      // inside the clamp bounds
      assert(gWin >= lo / 100.0 - 1e-9 && gWin <= hi / 100.0 + 1e-9, tpe)
    }
  }

  test("k = 0 degenerates: all three means coincide") {
    import spark.implicits._
    // 9 rows → k = 0 → no clamping, no trimming
    val ev = (1 to 9).map(i =>
      ("t", i.toLong, java.sql.Timestamp.valueOf(f"2024-03-01 00:0$i:00"), i.toDouble))
      .toDF("event_type", "event_id", "ts", "value")
    // winsorizeQuery is table-bound; replicate the small-group law on
    // the sequential reference instead
    val vals = (1 to 9).map(_ * 100L)
    val n = vals.length; val k = n / 10
    assert(k == 0)
    val win = vals.map(v => math.max(math.min(v, vals(n - k - 1)), vals(k)))
    assert(win == vals && vals.slice(k, n - k) == vals)
    assert(ev.count() == 9)
  }
}
