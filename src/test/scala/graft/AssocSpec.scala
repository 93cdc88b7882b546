package graft

import graft.operators.Assoc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AssocSpec extends AnyFunSuite {
  import SparkTestSession._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("rules are symmetric in support and lift, directional in confidence; lift honest") {
    val rows = Assoc.assocQuery(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(rows.nonEmpty)
    for (((a, b), (cab, sup, _, lift)) <- rows) {
      // both directions emitted with identical pair count and lift
      val rev = rows((b, a))
      assert(rev._1 == cab && rev._2 == sup && rev._4 == lift, s"$a->$b")
      assert(sup > 0.0 && lift > 0.0)
    }
    // the fixture's sessions are short (~1 distinct type each), so
    // every pair co-occurs far BELOW chance — lift < 1 across the
    // board is the honest reading, and it discriminates: a counting
    // bug toward independence would push lift to ≈ 1
    assert(rows.values.forall { case (_, _, _, l) => l > 0.0 && l < 0.5 })
  }

  test("sequential basket recompute parity (distinct per-session item sets)") {
    val got = Assoc.assocQuery(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(6)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000, r.getLong(2), r.getString(3)))
    // sequential sessionize: same 30-min gap rule
    val baskets = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var seq = 0L
      var prev = Long.MinValue
      sorted.toSeq.map { e =>
        if (prev == Long.MinValue || e._2 - prev > 1800000000L) seq += 1
        prev = e._2
        ((u, seq), e._4)
      }
    }.distinct
    val nSessions = baskets.map(_._1).distinct.size.toLong
    val itemC = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairC = baskets.groupBy(_._1).values.flatMap { items =>
      val ts = items.map(_._2).distinct
      for (a <- ts; b <- ts if a != b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = pairC.filter(_._2 >= Assoc.MinSupport).map { case ((a, b), cab) =>
      (a, b) -> ((cab, itemC(a), itemC(b), r6(cab.toDouble / itemC(a).toDouble)))
    }
    assert(got == expect)
    assert(nSessions > 0)
  }
}
