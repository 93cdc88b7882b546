package graft

import java.sql.Timestamp
import graft.operators.{Attribution, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AttributionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, Long, String)]) =
    rows.map { case (id, uid, sec, t) =>
      (id, uid, new Timestamp(sec * 1000), t)
    }.toDF("event_id", "user_id", "ts", "event_type")

  test("first/last/linear credit on a hand-built journey; direct purchases credit (direct)") {
    val g = Paths.GapUs / 1000000L // gap in seconds
    val rows = Seq(
      // user 1: view -> click -> signup -> purchase (all in window)
      (1L, 1L, 100L, "view"), (2L, 1L, 200L, "click"),
      (3L, 1L, 300L, "signup"), (4L, 1L, 400L, "purchase"),
      // user 2: a touch OUTSIDE the window, then purchase -> (direct)
      (5L, 2L, 100L, "view"), (6L, 2L, 100L + g + 50L, "purchase"),
      // user 3: purchase with no events at all -> (direct)
      (7L, 3L, 500L, "purchase"))
    val out = Attribution.attribution(ev(rows))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // user 1's journey: first=view, last=signup, linear 1/3 each with
    // the remainder (1) on the last touch
    assert(out("view") == ((1L, 0L, 333333L)))
    assert(out("click") == ((0L, 0L, 333333L)))
    assert(out("signup") == ((0L, 1L, 333334L)))
    assert(out("(direct)") == ((2L, 2L, 2000000L)))
    // accounting invariant: total linear micro-credit = 1e6 per purchase
    assert(out.values.map(_._3).sum == 3L * 1000000L)
  }

  test("time-to-convert: exact order statistics on a hand-built cohort; empty set reports 0") {
    import graft.operators.Events
    // users 1..5 convert with latencies 10, 20, 30, 40, 100 seconds;
    // user 6 purchases BEFORE viewing (not a conversion); user 7 only views
    val rows = Seq(
      (1L, 1L, 1000L, "view"), (2L, 1L, 1010L, "purchase"),
      (3L, 2L, 1000L, "view"), (4L, 2L, 1020L, "purchase"),
      (5L, 3L, 1000L, "view"), (6L, 3L, 1030L, "purchase"),
      (7L, 4L, 1000L, "view"), (8L, 4L, 1040L, "purchase"),
      (9L, 5L, 1000L, "view"), (10L, 5L, 1100L, "purchase"),
      (11L, 6L, 1000L, "purchase"), (12L, 6L, 1100L, "view"),
      (13L, 7L, 1000L, "view"))
    val df = rows.map { case (id, uid, sec, t) =>
      (id, uid, new Timestamp(sec * 1000), t)
    }.toDF("event_id", "user_id", "ts", "event_type")
    val got = Events.timeToConvert(df)
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    // n=5: p50 at rank ceil(2.5)=3 -> 30s; p90 at rank ceil(4.5)=5 -> 100s
    assert(got._1 == 5L)
    assert(got._2.contains(30.0) && got._3.contains(100.0))
    assert(got._4.contains(40.0)) // mean of 10,20,30,40,100
    val empty = Events.timeToConvert(
      df.filter(col("event_type") === "view"))
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    assert(empty._1 == 0L && empty._2.isEmpty && empty._4.isEmpty)
  }

  test("ties on the corpus hold the accounting invariant and journey bounds") {
    val events = Tables.events(spark, sf)
    val out = Attribution.attribution(events)
      .as[(String, Long, Long, Long)].collect()
    val purchases = events.filter(col("event_type") === "purchase").count()
    assert(out.map(_._4).sum == purchases * 1000000L,
      "linear credit must conserve exactly one micro-unit-million per purchase")
    assert(out.map(_._2).sum == purchases && out.map(_._3).sum == purchases,
      "every purchase has exactly one first and one last attribution")
    // purchase can never credit itself
    assert(!out.exists(_._1 == "purchase"))
  }
}
