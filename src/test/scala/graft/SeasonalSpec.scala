package graft

import java.sql.Timestamp
import graft.operators.{Events, Seasonal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeasonalSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** (hour index, type, count) → event rows at that hour. */
  private def ev(rows: Seq[(Long, String, Long)]) =
    rows.zipWithIndex.flatMap { case ((hr, t, n), i) =>
      (1L to n).map(j =>
        (i * 100000L + j, 1L, new Timestamp(hr * 3600L * 1000), t))
    }.toDF("event_id", "user_id", "ts", "event_type")

  // two weeks of a daily rhythm: 10 events every hour, 200 at noon —
  // the noon spike IS the normal pattern; hour 301 (a 1pm, NOT a noon:
  // 301 % 24 = 13) gets a genuinely anomalous 120
  private val plantedHour = 301L
  private val rows = (0L until 336L).map { h =>
    val base = if (h % 24 == 12) 200L else 10L
    (h, "load", if (h == plantedHour) 120L else base)
  }

  test("a periodic feed false-alarms the stationary screen but not the seasonal one") {
    val feed = ev(rows)
    val anomFlags = Events.anomaly(feed)
      .filter(col("is_anomaly") === 1)
      .select(col("hour")).as[String].collect()
    // q_anomaly flags every noon: 14 rush hours misread as anomalies
    assert(anomFlags.length >= 14,
      s"the stationary screen must false-alarm on the daily rhythm: ${anomFlags.length}")
    assert(anomFlags.count(_.contains(" 12:00:00")) >= 14)

    val seasFlags = Seasonal.seasonal(feed)
      .filter(col("is_anomaly") === 1)
      .select(col("hour"), col("z_seasonal")).as[(String, Double)].collect()
    // the seasonal screen flags the planted cell (and at most its
    // hour-of-week twin, which the planted value biased — leave-in
    // estimation, documented), never a rush hour
    assert(seasFlags.nonEmpty && seasFlags.length <= 2,
      s"seasonal screen must flag only the planted cell (+ its biased twin): ${seasFlags.toSeq}")
    assert(seasFlags.forall(!_._1.contains(" 12:00:00")),
      s"no rush hour may alarm the seasonal screen: ${seasFlags.toSeq}")
  }

  test("baseline reproduces the rhythm exactly on a noiseless periodic feed") {
    val clean = ev((0L until 336L).map(h =>
      (h, "load", if (h % 24 == 12) 200L else 10L)))
    val out = Seasonal.seasonal(clean)
      .select(col("hour"), col("n_events"), col("baseline"), col("z_seasonal"))
      .as[(String, Long, Double, Option[Double])].collect()
    assert(out.length == 336)
    out.foreach { case (hour, y, b, z) =>
      assert(b == y.toDouble, s"$hour: noiseless rhythm => baseline == value")
    }
    // all residuals 0 => sd = 0 => z NULL everywhere, zero flags
    assert(out.forall(_._4.isEmpty))
  }

  test("seasonal strength: periodic feed ~1, white feed ~0, flat feed NULL, peak phase exact") {
    import graft.operators.Changepoint
    def strengthOf(feed: org.apache.spark.sql.DataFrame) =
      graft.operators.Seasonal.strength(Changepoint.cells(feed))
        .as[(String, Long, Option[Double], Long, Double)].collect().head
    // pure rhythm: the profile explains everything
    val periodic = ev((0L until 336L).map(h =>
      (h, "load", if (h % 24 == 12) 200L else 10L)))
    val p = strengthOf(periodic)
    assert(p._3.exists(_ > 0.99), s"pure rhythm must score ~1: $p")
    assert(p._4 == (12L + 0L) % 168L || p._4 % 24 == 12,
      s"peak phase must be a noon: ${p._4}")
    assert(p._5 == 200.0)
    // aperiodic (md5-noise) feed: the profile explains ~nothing
    val noisy = ev((0L until 336L).map(h =>
      (h, "load", 10L + (math.abs(s"n:$h".hashCode) % 20L))))
    val n = strengthOf(noisy)
    assert(n._3.exists(_ < 0.6), s"aperiodic feed must score low: $n")
    // flat feed: zero total variance -> NULL (degenerate guard)
    val flat = ev((0L until 100L).map(h => (h, "load", 5L)))
    assert(strengthOf(flat)._3.isEmpty)
  }

  test("missing hours are y=0 observations, not skipped (the gapfill rule)") {
    // 3 WEEKS hourly at 10 (every hour-of-week cell needs >= 2
    // observations, or the profile degenerates to self-prediction),
    // but hour 30 entirely absent from the feed
    val gappy = ev((0L until 504L).filter(_ != 30L).map(h => (h, "load", 10L)))
    val out = Seasonal.seasonal(gappy)
      .as[(String, String, Long, Double, Option[Double], Int)].collect()
    assert(out.length == 504, "the dense grid must include the silent hour")
    val gap = out.find(_._3 == 0L)
    assert(gap.isDefined, "the silent hour must appear as y=0")
    assert(gap.get._6 == 1 && gap.get._5.exists(_ < 0),
      "a dead hour in an otherwise steady feed must alarm, below baseline")
    // the only other flags allowed are the dead hour's hw twins,
    // whose baseline the gap itself depressed
    val flags = out.filter(_._6 == 1)
    assert(flags.length <= 3, s"only the gap and its biased twins: ${flags.toSeq}")
  }
}
