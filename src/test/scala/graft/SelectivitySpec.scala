package graft

import graft.operators.{ActiveUsers, Kanon, Selectivity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Selectivity bracketing, active users, l-diversity — the planner /
  * dashboard / privacy follow-up block.
  */
class SelectivitySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("selectivity bracket holds for every type and is non-trivial") {
    val rows = Selectivity.selectivity(spark, sf)
      .select(col("event_type"), col("est_lo"), col("est_hi"), col("exact"),
        col("bracket_holds"))
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._5, s"bracket violated for ${r._1}: $r")
      assert(r._2 <= r._4 && r._4 <= r._3)
    }
    // the bracket must do work: bounds differ from 0/n somewhere
    assert(rows.exists(r => r._2 > 0 || r._3 < Long.MaxValue))
    assert(rows.exists(r => r._3 - r._2 > 0),
      "edge buckets should make the bracket non-degenerate somewhere")
  }

  test("active users: sequential recount of dau/new/cumulative") {
    val got = ActiveUsers.activeUsers(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val ev = Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM-dd"), col("user_id"))
      .as[(String, Long)].collect()
    val byDay = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val firstDay = ev.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    var cum = 0L
    val days = byDay.keys.toSeq.sorted
    assert(got.map(_._1).toSeq == days)
    for ((day, row) <- days.zip(got)) {
      val users = byDay(day)
      val newU = firstDay.count(_._2 == day).toLong
      cum += newU
      assert(row == ((day, users.length.toLong, users.distinct.length.toLong,
        newU, cum)), s"day $day: $row")
    }
  }

  test("l-diversity: a uniform-sensitive group fails l while passing k") {
    val docs = Seq.fill(8)((10L, "s1", "en", 100L)) ++ // k ok, l fails (1 lang)
      (1L to 6L).map(i => (i, "s2", Seq("en", "de", "fr")(i.toInt % 3), 100L))
    val out = Kanon.lDiversity(spark, sf)
    // fixture-level: verdicts discriminate
    val agg = out.agg(
      sum(when(col("k_ok") && !col("l_ok"), 1).otherwise(0)).cast("long"),
      sum(when(col("k_ok") && col("l_ok"), 1).otherwise(0)).cast("long"))
      .as[(Long, Long)].head()
    assert(agg._1 > 0, "fixture must hold k-anonymous but sensitive-uniform groups")
    assert(agg._2 > 0, "fixture must hold fully-passing groups")
    // hand fixture through the same aggregate shape
    val hand = docs.toDF("doc_id", "source", "lang", "n_chars")
      .groupBy(col("source"))
      .agg(countDistinct(col("lang")).as("nl"))
      .as[(String, Long)].collect().toMap
    assert(hand("s1") == 1L && hand("s2") == 3L)
  }
}
