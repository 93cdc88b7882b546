package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AbtestSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("hash-split arms on the fixture give an honest null: |z| < 1.96") {
    val r = Events.abtest(spark, sf).collect().head
    assert(!r.getAs[Boolean]("significant_95"))
    assert(r.getAs[Long]("na") + r.getAs[Long]("nb") ==
      Tables.events(spark, sf).select(col("user_id")).distinct().count())
  }

  test("a planted effect at scale is detected; z sign follows the better arm") {
    // sequential z reference on planted counts
    def z(na: Long, ca: Long, nb: Long, cb: Long): Double = {
      val p = (ca + cb).toDouble / (na + nb)
      (ca.toDouble / na - cb.toDouble / nb) /
        math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    }
    assert(z(1000, 800, 1000, 200) > 1.96, "A better → z positive, significant")
    assert(z(1000, 200, 1000, 800) < -1.96)
    assert(math.abs(z(1000, 500, 1000, 500)) < 1e-9)
  }

  test("cuped: variance drops, arm difference is preserved, parity with sequential recompute") {
    val rows = Events.cuped(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("A", "B"))
    for ((_, r) <- rows) {
      // users are persistent across halves → pre-period explains real
      // variance: the reduction must be strictly positive
      assert(r.getAs[Double]("var_adj") < r.getAs[Double]("var_y"))
      assert(r.getAs[Double]("var_reduction") > 0.0)
    }
    // sequential recompute (exact moments, same double shapes)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      (u, es.count(_._2 < mid).toLong, es.count(_._2 >= mid).toLong)
    }.toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def arm(u: Long): String = {
      val h = md.digest(s"arm:$u".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString.take(7)
      if (java.lang.Long.parseLong(h, 16) % 2 == 0) "A" else "B"
    }
    val pooled = perUser
    val pn = pooled.length.toDouble
    val psx = pooled.map(_._2).sum.toDouble
    val psy = pooled.map(_._3).sum.toDouble
    val psxx = pooled.map(t => t._2 * t._2).sum.toDouble
    val psxy = pooled.map(t => t._2 * t._3).sum.toDouble
    val theta = (pn * psxy - psx * psy) / (pn * psxx - psx * psx)
    for (v <- Seq("A", "B")) {
      val g = perUser.filter(t => arm(t._1) == v)
      val n = g.length.toDouble
      val sy = g.map(_._3).sum.toDouble
      val sx = g.map(_._2).sum.toDouble
      val got = rows(v)
      assert(got.getAs[Long]("n_users") == g.length)
      assert(got.getAs[Double]("mean_y") == r6(sy / n), v)
      assert(got.getAs[Double]("mean_adj") ==
        r6(sy / n - theta * (sx / n - psx / pn)), v)
    }
  }

  test("degenerate pools (all or none convert) report null z, never infinity") {
    // replay the operator's guard on closed-form counts
    val guard = (ca: Long, cb: Long, na: Long, nb: Long) =>
      ca + cb > 0 && ca + cb < na + nb
    assert(!guard(0, 0, 10, 10))
    assert(!guard(10, 10, 10, 10))
    assert(guard(5, 3, 10, 10))
  }
}
