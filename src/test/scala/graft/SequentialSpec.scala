package graft

import java.sql.Timestamp
import graft.operators.{Events, Sequential}
import org.scalatest.funsuite.AnyFunSuite

class SequentialSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val hourMs = 3600000L
  private val base = Timestamp.valueOf("2024-06-01 00:00:00").getTime

  private def ts(h: Int) = new Timestamp(base + h * hourMs)

  /** The operator's own md5 parity, reproduced to pick users per arm. */
  private def armOf(u: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"arm:$u".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(7)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
  }

  test("boundary ladder is the OBF closed form and relaxes to 2.04") {
    val b = Sequential.Boundaries
    assert(b.size == 5)
    assert(b.last == 2.04)
    assert(b == b.sorted.reverse, "boundary must be monotone decreasing")
    assert(math.abs(b.head - 2.040 * math.sqrt(5.0)) < 1e-6)
  }

  test("an early naive-significant z does NOT stop; a massive one does") {
    val as = (1L to 400L).filter(armOf(_) == "A").take(60)
    val bs = (1L to 400L).filter(armOf(_) == "B").take(60)
    // span: 100 hours -> look k checkpoint at hour 20k. All users
    // present from hour 0; A-arm users convert (AbConvertThreshold
    // purchases) before hour 20, B-arm users never do.
    val purchases = as.flatMap(u =>
      (0 until Events.AbConvertThreshold).map(i => (u, "purchase", ts(1 + i % 18))))
    val views = (as ++ bs).map(u => (u, "view", ts(0))) ++
      Seq((as.head, "view", ts(100))) // pins the span end
    val ev = (purchases ++ views).toDF("user_id", "event_type", "ts")
    val r = Sequential.sequential(ev).collect()
      .map(x => x.getAs[Int]("look") ->
        ((x.getAs[Double]("z"), x.getAs[Double]("boundary"),
          x.getAs[Boolean]("may_stop")))).toMap
    // look 1: 60 vs 0 conversions out of 60/60 -> |z| huge (~7.7):
    // clears even the brutal first boundary 4.56
    assert(math.abs(r(1)._1) > r(1)._2 && r(1)._3,
      s"overwhelming effect must stop at look 1: ${r(1)}")

    // now a mild effect: 14 of 60 A convert, 5 of 60 B -> |z| ~ 2.2 -
    // naive-significant at 1.96 from look 1, but the OBF boundary
    // refuses until it relaxes below |z| at the horizon
    val purch2 = as.take(14).flatMap(u =>
      (0 until Events.AbConvertThreshold).map(i => (u, "purchase", ts(1 + i % 18)))) ++
      bs.take(5).flatMap(u =>
        (0 until Events.AbConvertThreshold).map(i => (u, "purchase", ts(1 + i % 18))))
    val ev2 = (purch2 ++ views).toDF("user_id", "event_type", "ts")
    val r2 = Sequential.sequential(ev2).collect()
      .map(x => x.getAs[Int]("look") ->
        ((x.getAs[Double]("z"), x.getAs[Double]("boundary"),
          x.getAs[Boolean]("may_stop")))).toMap
    assert(math.abs(r2(1)._1) > 1.96,
      s"fixture sanity: naive peek would fire at look 1: ${r2(1)}")
    assert(!r2(1)._3 && !r2(2)._3,
      s"OBF must refuse the early peek: ${r2(1)}, ${r2(2)}")
    assert(r2(5)._3,
      s"same effect may stop once the boundary relaxes: ${r2(5)}")
  }
}
