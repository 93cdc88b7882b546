package graft

import java.sql.Timestamp
import graft.operators.Changepoint
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChangepointSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** `counts(i)` events in dense hour i (0-based). */
  private def series(tpe: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(j => (tpe, Timestamp.valueOf(
        f"2024-03-0${1 + h / 24} ${h % 24}%02d:00:${j % 60}%02d.${j}%06d")))
    }

  test("planted level shift is found at the planted cut with the planted means") {
    // 6 hours at 4/hour then 6 hours at 20/hour: cut after k=6
    val ev = series("deploy", Seq(4, 4, 4, 4, 4, 4, 20, 20, 20, 20, 20, 20))
      .toDF("event_type", "ts")
    val row = Changepoint.changepoint(ev).collect().head
    assert(row.getAs[Long]("cut_k") == 6L)
    assert(row.getAs[String]("cut_hour") == "2024-03-01 06:00:00")
    assert(row.getAs[Double]("mean_before") == 4.0)
    assert(row.getAs[Double]("mean_after") == 20.0)
    // a clean two-level step: the one-split model explains ALL variance
    assert(row.getAs[Double]("explained") == 1.0)
  }

  test("flat series degenerates: zero gain, NULL explained, earliest cut by tie rule") {
    val ev = series("flat", Seq.fill(8)(5)).toDF("event_type", "ts")
    val row = Changepoint.changepoint(ev).collect().head
    assert(row.getAs[Long]("cut_k") == 1L)
    assert(row.getAs[Double]("gain") == 0.0)
    assert(row.isNullAt(row.fieldIndex("explained")))
  }

  test("sequential prefix-sum argmax parity on the events corpus") {
    val ev = Tables.events(spark, sf)
    val got = Changepoint.changepoint(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("cut_k"), r.getAs[Double]("gain"))).toMap

    // dense per-type hourly counts off the same frame
    val hourly = ev.groupBy(col("event_type"),
      date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val lo = hourly.map(_._2).min
    val hi = hourly.map(_._2).max
    val hoursN = ((hi - lo) / 3600000L).toInt + 1
    val types = hourly.map(_._1).distinct
    for (t <- types) {
      val y = Array.fill(hoursN)(0L)
      hourly.filter(_._1 == t).foreach { case (_, h, c) =>
        y(((h - lo) / 3600000L).toInt) = c
      }
      val sn = y.sum
      var sk = 0L
      var best = (Double.NegativeInfinity, 0L)
      for (k <- 1 until hoursN) {
        sk += y(k - 1)
        val g = r6(sk.toDouble * sk.toDouble / k.toDouble +
          (sn - sk).toDouble * (sn - sk).toDouble / (hoursN - k).toDouble -
          sn.toDouble * sn.toDouble / hoursN.toDouble)
        if (g > best._1) best = (g, k.toLong)
      }
      assert(got(t) == ((best._2, best._1)), t)
    }
  }
}
