package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DKW rank-band cross-validation of the served time-to-convert
  * quantiles: the exact CDF evaluated at each served estimate must
  * sit within the stamped rank_eps of its target quantile, and the
  * exact statistics (n, mean) must match the exact operator verbatim.
  */
class TtcServedSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("served quantiles land within the stamped DKW rank band of the exact CDF") {
    val served = Events.timeToConvertServed(spark, sf).collect().head
    val n = served.getAs[Long]("n_converted")
    val m = served.getAs[Long]("m_sample")
    val eps = served.getAs[Double]("rank_eps")
    assert(n > 0 && m > 0)

    // exact latencies, driver-side (bounded by converting users at sf)
    val lats = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", unix_micros(col("ts")))).as("v"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("p"))
      .filter(col("v").isNotNull && col("p").isNotNull && col("v") <= col("p"))
      .select((col("p") - col("v")).cast("double") / 1e6)
      .as[Double].collect().sorted
    assert(lats.length == n)

    def cdf(x: Double): Double = lats.count(_ <= x).toDouble / lats.length
    for ((q, est) <- Seq(0.5 -> served.getAs[Double]("p50_est_s"),
      0.9 -> served.getAs[Double]("p90_est_s"))) {
      val f = cdf(est)
      // the sample value at rank ceil(m*q) has F within q +- eps
      // (DKW at delta = 0.05), plus 1/m of rank discretization
      assert(math.abs(f - q) <= eps + 1.0 / m + 1e-9,
        s"q=$q: F(est)=$f outside +-${eps + 1.0 / m}")
    }
    // exact pieces are exact
    val exact = Events.timeToConvertQuery(spark, sf).collect().head
    assert(exact.getAs[Long]("n_converted") == n)
    assert(math.abs(exact.getAs[Double]("mean_s") -
      served.getAs[Double]("mean_s")) < 1e-9)
  }
}
