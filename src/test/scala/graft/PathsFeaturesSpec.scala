package graft

import graft.operators.{Features, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PathsFeaturesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("transitions stop at the session gap and count per-user consecutive pairs") {
    val ev = Seq(
      // user 1: a→b within gap, b→c across a 40-min gap (excluded)
      (1L, 1L, ts(0L), "a"), (1L, 2L, ts(60L * 1000000), "b"),
      (1L, 3L, ts(60L * 1000000 + 2400L * 1000000), "c"),
      // user 2: a→b again
      (2L, 4L, ts(0L), "a"), (2L, 5L, ts(1000000L), "b"))
      .toDF("user_id", "event_id", "ts", "value_s")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value_s").as("event_type"))
    val got = Paths.transitions(ev)
      .select(col("from_type"), col("to_type"), col("n"), col("p_next"))
      .as[(String, String, Long, Double)].collect().toSet
    assert(got == Set(("a", "b", 2L, 1.0)))
  }

  test("conditional probabilities sum to 1 per source state on the corpus") {
    val rep = Paths.sessionPaths(spark, sf)
    val sums = rep.groupBy(col("from_type"))
      .agg(sum(col("p_next")).as("s")).as[(String, Double)].collect()
    sums.foreach { case (t, s) =>
      assert(math.abs(s - 1.0) < 1e-4, s"$t sums to $s")
    }
  }

  test("lag features match a driver-side recount for a sampled user") {
    val all = Features.lagFeaturesQuery(spark, sf)
    val uid = all.select(col("user_id")).as[Long].head()
    val got = all.filter(col("user_id") === uid)
      .select(col("event_id"), col("prev_value_r6"), col("roll3_n"), col("roll3_mean_r6"))
      .as[(Long, Option[Double], Long, Double)].collect()
    val raw = Tables.events(spark, sf).filter(col("user_id") === uid)
      .select(col("event_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)].collect()
      .sortBy(r => (r._2.getTime, r._1))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    got.zipWithIndex.foreach { case ((eid, prev, n3, mean3), i) =>
      assert(eid == raw(i)._1)
      if (i == 0) assert(prev.isEmpty)
      else assert(prev.contains(r6(raw(i - 1)._3)))
      val w = raw.slice(math.max(0, i - 2), i + 1).map(_._3)
      assert(n3 == w.length)
      assert(mean3 == r6(w.map(BigDecimal(_)).sum.toDouble / w.length))
    }
  }

  test("one exchange only: every feature rides the same per-user window sort") {
    val plan = Features.lagFeatures(Tables.events(spark, sf))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, plan.linesIterator.filter(_.contains("Exchange"))
      .mkString("\n"))
  }
}
