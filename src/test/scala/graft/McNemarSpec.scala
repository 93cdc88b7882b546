package graft

import graft.operators.McNemar
import org.scalatest.funsuite.AnyFunSuite

class McNemarSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._
  import org.apache.spark.sql.functions._

  /** events frame from (user, hour, type) triples on a 0..10h span;
    * user 0 pins the span ends with neutral 'view' events.
    */
  private def ev(rows: Seq[(Long, Int, String)]) =
    ((0L, 0, "view") +: (0L, 10, "view") +: rows)
      .toDF("user_id", "h", "event_type")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("h") * 3600L))
      .select("ts", "user_id", "event_type")

  test("symmetric flips: b = c, continuity correction leaves chi2 = 1/(b+c)") {
    // midpoint = hour 5: users 1-10 purchase only before, 11-20 only after
    val rows = (1L to 10L).map(u => (u, 1, "purchase")) ++
      (11L to 20L).map(u => (u, 9, "purchase"))
    val r = McNemar.mcnemarOf(ev(rows), "purchase").collect().head
    assert(r.getAs[Long]("n_yn") == 10L && r.getAs[Long]("n_ny") == 10L)
    assert(r.getAs[Long]("chi2_micro") == 1000000L / 20L)
    assert(r.getAs[Int]("significant_05") == 0)
  }

  test("one-directional adoption: all flips no->yes, strongly significant") {
    val rows = (1L to 30L).map(u => (u, 9, "purchase"))
    val r = McNemar.mcnemarOf(ev(rows), "purchase").collect().head
    assert(r.getAs[Long]("n_yn") == 0L && r.getAs[Long]("n_ny") == 30L)
    // (|0-30|-1)^2 * 1e6 div 30 = 841e6 div 30
    assert(r.getAs[Long]("chi2_micro") == 841L * 1000000L / 30L)
    assert(r.getAs[Int]("significant_05") == 1)
  }

  test("no discordant users: chi2 and verdict NULL") {
    // every purchaser purchases in BOTH halves
    val rows = (1L to 5L).flatMap(u => Seq((u, 1, "purchase"), (u, 9, "purchase")))
    val r = McNemar.mcnemarOf(ev(rows), "purchase").collect().head
    assert(r.getAs[Long]("n_yy") == 5L)
    assert(r.isNullAt(r.fieldIndex("chi2_micro")))
    assert(r.isNullAt(r.fieldIndex("significant_05")))
  }

  test("boundary event lands in the FIRST half (<= mid, exact integer midpoint)") {
    // span 0..10h, midpoint exactly hour 5: a purchase AT hour 5 is y1
    val r = McNemar.mcnemarOf(ev(Seq((1L, 5, "purchase"))), "purchase")
      .collect().head
    assert(r.getAs[Long]("n_yn") == 1L && r.getAs[Long]("n_ny") == 0L)
  }
}
