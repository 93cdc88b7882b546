package graft

import graft.operators.{Kmv, Winsorize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of the sketch-served winsorize against the exact
  * rank form (the q_lift/Audience discipline): the served bounds must
  * be RANK-bracketed by exact order statistics, and the served
  * winsorized mean must sit inside the exact-mean envelope those
  * brackets induce (the clamp is monotone in both bounds, so the
  * envelope is a true bound, not a heuristic tolerance).
  */
class WinsorizeServedSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def centsByType: Map[String, Array[Long]] =
    Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("vc"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }

  test("served bounds rank-bracketed by exact p5..p15 / p85..p95; mean inside the envelope") {
    val served = Winsorize.winsorizeServed(spark, sf)
      .select(col("event_type"), col("lo"), col("hi"), col("winsor_mean"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val exact = centsByType
    assert(served.keySet == exact.keySet)
    served.foreach { case (ty, (loD, hiD, wmean)) =>
      val vs = exact(ty)
      val n = vs.length
      def at(p: Double): Long = vs(math.min(n - 1,
        math.max(0, math.ceil(n * p).toInt - 1)))
      val (lo, hi) = ((loD * 100).round, (hiD * 100).round)
      assert(lo >= at(0.05) && lo <= at(0.15),
        s"$ty: served lo=$lo outside exact [p5=${at(0.05)}, p15=${at(0.15)}]")
      assert(hi >= at(0.85) && hi <= at(0.95),
        s"$ty: served hi=$hi outside exact [p85=${at(0.85)}, p95=${at(0.95)}]")
      // monotone envelope: clamping at (p5, p85) / (p15, p95) bounds
      // every winsorized mean whose bounds sit inside those brackets
      def wm(l: Long, h: Long): Double =
        vs.map(v => math.max(math.min(v, h), l)).sum.toDouble / (n * 100.0)
      val (lBound, uBound) = (wm(at(0.05), at(0.85)), wm(at(0.15), at(0.95)))
      assert(wmean >= lBound - 1e-6 && wmean <= uBound + 1e-6,
        s"$ty: served winsor_mean=$wmean outside envelope [$lBound, $uBound]")
    }
  }

  test("the serve off a materialized sketch touches the corpus exactly once") {
    val ev = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("vc"))
    val sk = Kmv.sketch(ev, "event_type", "event_id", "vc").localCheckpoint()
    val plan = Winsorize.winsorizeServedFrom(ev, sk)
      .queryExecution.executedPlan.toString.toLowerCase
    val scans = "scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected ONE corpus scan, saw $scans:\n$plan")
    // the rank window (and its tiny sort) lives on the <=k-row SKETCH
    // side only (by design); the corpus side must be scan -> clamp ->
    // partial agg through a BROADCAST of the bounds, never sort-merged
    assert(plan.contains("broadcasthashjoin") && !plan.contains("sortmergejoin"),
      "bounds must broadcast; the corpus must never sort-merge")
  }
}
