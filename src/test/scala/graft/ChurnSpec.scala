package graft

import java.sql.Timestamp
import graft.operators.Churn
import org.scalatest.funsuite.AnyFunSuite

class ChurnSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dayMs = 86400000L
  private val base = Timestamp.valueOf("2024-01-01 12:00:00").getTime

  private def ts(day: Int) = new Timestamp(base + day * dayMs)

  test("hazard ladder with censoring: closed form on planted lifetimes") {
    // horizon = day 70 (user 1's last activity)
    val ev = Seq(
      (1L, 0), (1L, 35), (1L, 70),   // tenure 10w, alive at horizon
      (2L, 0), (2L, 13),             // tenure 1w, idle 57d -> dead
      (3L, 0),                       // tenure 0w, idle 70d -> dead
      (4L, 7), (4L, 28),             // tenure 3w, idle 42d -> dead
      (5L, 56), (5L, 63))            // tenure 1w, idle 7d -> CENSORED
      .map { case (u, d) => (u, ts(d)) }
    val r = Churn.churn(ev.toDF("user_id", "ts")).collect()
      .map(x => x.getAs[Long]("k") ->
        ((x.getAs[Long]("at_risk"), x.getAs[Long]("churned"),
          x.getAs[Long]("hazard_micro"), x.getAs[Long]("cum_churned"))))
      .toMap
    assert(r.keys.max == 10L && r.size == 11, s"dense 0..10 ladder: $r")
    assert(r(0L) == ((5L, 1L, 200000L, 1L)), s"$r")
    assert(r(1L) == ((4L, 1L, 250000L, 2L)), s"$r")
    assert(r(2L) == ((2L, 0L, 0L, 2L)), s"$r")
    assert(r(3L) == ((2L, 1L, 500000L, 3L)), s"$r")
    // the censored users (1 and 5) never appear as deaths: user 5 sits
    // in the k<=1 denominators, user 1 in every one
    (4L to 10L).foreach(k => assert(r(k) == ((1L, 0L, 0L, 3L)), s"k=$k: $r"))
  }

  test("counting censored users as churned would overstate the tail hazard") {
    // all users share tenure 2w; half are idle at the horizon, half not
    val ev = Seq(
      (1L, 0), (1L, 14), (2L, 0), (2L, 14),          // idle 36d -> dead
      (3L, 36), (3L, 50), (4L, 36), (4L, 50))        // idle 0d  -> censored
      .map { case (u, d) => (u, ts(d)) }
    val r = Churn.churn(ev.toDF("user_id", "ts")).collect()
      .map(x => x.getAs[Long]("k") -> x.getAs[Long]("hazard_micro")).toMap
    assert(r(2L) == 500000L,
      s"2 deaths over 4 at-risk, NOT 4/4 — censoring respected: $r")
  }
}
