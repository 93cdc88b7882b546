package graft

import graft.operators.TailIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TailIndexSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** One event row per (key, id, count) unit. */
  private def ev(rows: Seq[(String, Long, Long)]) =
    rows.flatMap { case (k, id, n) => (1L to n).map(_ => (k, id)) }
      .toDF("event_type", "user_id")

  test("a planted Pareto tail recovers its exponent; a thin tail reads heavier alpha") {
    // exact Pareto(alpha=1): degree of id i = N/i (Zipf) — Hill must
    // read alpha ~ 1 (infinite variance, the reducer-melting regime)
    val n = 400
    val pareto = ev((1 to n).map(i => ("pareto", i.toLong, (4000L / i).max(1L))))
    val p = TailIndex.tailIndex(pareto, "event_type", "user_id")
      .as[(String, Long, Long, Long, Option[Double], Option[Int])].head()
    assert(p._2 == n && p._3 == n / 10)
    assert(p._5.exists(a => a > 0.8 && a < 1.3), s"Zipf tail must read alpha~1: $p")
    assert(p._6.contains(1), "alpha <= 2 must flag infinite variance")

    // geometric-ish thin tail: degree ~ descending linear — much
    // lighter tail, alpha far above 2, no flag
    val thin = ev((1 to n).map(i => ("thin", i.toLong, (410L - i))))
    val t = TailIndex.tailIndex(thin, "event_type", "user_id")
      .as[(String, Long, Long, Long, Option[Double], Option[Int])].head()
    assert(t._5.exists(_ > 2.5), s"near-uniform tail must read heavy alpha: $t")
    assert(t._6.contains(0))
  }

  test("degenerate tails report NULL, never NaN") {
    // all degrees equal: ln terms cancel, denominator 0
    val flat = ev((1 to 50).map(i => ("flat", i.toLong, 7L)))
    val f = TailIndex.tailIndex(flat, "event_type", "user_id")
      .as[(String, Long, Long, Long, Option[Double], Option[Int])].head()
    assert(f._5.isEmpty && f._6.isEmpty)
  }
}
