package graft

import java.sql.Timestamp
import graft.operators.{Ewma, HoltWinters}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HoltWintersSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Long)]) =
    rows.zipWithIndex.flatMap { case ((hr, t, n), i) =>
      (1L to n).map(j =>
        (i * 100000L + j, 1L, new Timestamp(hr * 3600L * 1000), t))
    }.toDF("event_id", "user_id", "ts", "event_type")

  test("constant series is a fixed point: exact level, zero trend, zero MAE") {
    val feed = ev((0L until 60L).map(h => (h, "flat", 7L)))
    val out = HoltWinters.hw(feed)
      .as[(String, Long, Long, Long, Double, Option[Double])].head()
    assert(out._3 == 7000000L, s"level drifted: ${out._3}")
    assert(out._4 == 0L && out._5 == 7.0)
    assert(out._6.contains(0.0), s"constant series must forecast itself: ${out._6}")
  }

  test("the seasonal term beats level-only EWMA on a periodic feed") {
    // six weeks of a daily rhythm: 10 hourly, 200 at noon — EWMA
    // chases the spike up and down forever; HW learns the phase (at
    // γ = 1/10 the noon slot converges ~0.9^cycle, so the window must
    // hold enough cycles for the learned regime to dominate the MAE)
    val feed = ev((0L until 1008L).map(h =>
      (h, "load", if (h % 24 == 12) 200L else 10L)))
    val hwMae = HoltWinters.hw(feed)
      .select(col("mae")).as[Option[Double]].head().get
    val ewMae = Ewma.ewma(feed)
      .select(col("mae")).as[Option[Double]].head().get
    assert(hwMae < 0.5 * ewMae,
      s"seasonal state must at least halve the one-step MAE: hw=$hwMae ewma=$ewMae")
  }

  test("forecast carries the learned phase: next-hour prediction includes its seasonal") {
    // end the feed right before a noon: the next hour IS the spike
    // phase, and the forecast must sit far above the off-peak level
    val feed = ev((0L until 500L).map(h =>
      (h, "load", if (h % 24 == 12) 200L else 10L)))
    // nH = 500, next phase = 500 % 24 = 20 (off-peak) — use a feed cut
    // such that nH % 24 == 12: nH = 492 -> 492 % 24 = 12
    val feed12 = ev((0L until 492L).map(h =>
      (h, "load", if (h % 24 == 12) 200L else 10L)))
    val f12 = HoltWinters.hw(feed12).select(col("forecast")).as[Double].head()
    val f20 = HoltWinters.hw(feed).select(col("forecast")).as[Double].head()
    assert(f12 > 100.0, s"noon-phase forecast must anticipate the spike: $f12")
    assert(f20 < 30.0, s"off-peak forecast must not: $f20")
  }
}
