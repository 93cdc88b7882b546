package graft

import graft.operators.Ks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of the sketch-served KS against the exact test
  * (the q_winsorize_kmv discipline): the served D̂ must sit within
  * its own certified DKW band of the exact D, and the conservative
  * `drift_certain` verdict must never fire where the exact test
  * accepts.
  */
class KsServedSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("served D within the DKW band of exact D; certain-drift never a false positive") {
    val exact = Ks.ksQuery(spark, sf)
      .select(col("event_type"), col("d"), col("drifted"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Int])))).toMap
    val served = Ks.ksServed(spark, sf)
      .select(col("event_type"), col("d_est"), col("eps"), col("drift_certain"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Int])))).toMap
    assert(served.keySet == exact.keySet)
    served.foreach { case (ty, (dEstO, epsO, certO)) =>
      (dEstO, epsO, exact(ty)._1) match {
        case (Some(dEst), Some(eps), Some(d)) =>
          assert(math.abs(dEst - d) <= eps + 1e-9,
            s"$ty: |D_est=$dEst - D=$d| exceeds certified eps=$eps")
          // conservative rule: certainty implies the exact test agrees
          if (certO.contains(1))
            assert(exact(ty)._2.contains(1),
              s"$ty: drift_certain fired but the exact test accepts")
        case _ => assert(dEstO.isEmpty == exact(ty)._1.isEmpty)
      }
    }
  }

  test("a planted whole-distribution shift is certain even through the sketch") {
    // early arm ~ U{0..999}, late arm ~ U{3000..3999}: D = 1, far
    // beyond eps at k=128 — the sketch must still CERTIFY the drift
    val n = 4000
    val rows = (0 until n).map { i =>
      val early = i < n / 2
      val v = if (early) (i * 7919) % 1000 else 3000 + (i * 104729) % 1000
      ("m", i.toLong, v.toDouble,
        java.sql.Timestamp.valueOf(
          if (early) "2024-01-01 00:00:00" else "2024-01-20 00:00:00"))
    }.toDF("event_type", "event_id", "value", "ts")
    // drive the internals directly (ksServed reads Tables.events)
    val span = rows.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts")))) / 2)
        .cast("long").as("mid"))
    val flagged = rows.crossJoin(broadcast(span))
      .select(col("event_type"), col("event_id"), col("value"),
        (unix_micros(col("ts")) < col("mid")).cast("long").as("early"))
    val sk = graft.operators.Kmv.sketch(
      flagged.withColumn("skey",
        concat_ws("|", col("event_type"), col("early"))),
      "skey", "event_id", "value")
    // both arm sketches full at k, and every early sample < every
    // late sample => exact-integer D_num = m1*m2
    val arms = sk.select(expr("substring_index(key, '|', -1)").cast("long")
      .as("early"), col("v"))
      .as[(Long, Double)].collect()
    val (e, l) = arms.partition(_._1 == 1L)
    assert(e.length == graft.operators.Kmv.K && l.length == graft.operators.Kmv.K)
    assert(e.map(_._2).max < l.map(_._2).min,
      "sketch must preserve the separation")
  }
}
