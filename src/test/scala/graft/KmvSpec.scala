package graft

import graft.operators.Kmv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def fixture(n: Int) = (1 to n).map { i =>
    // deterministic, roughly uniform values in [0, 1000)
    ("m", i.toLong, ((i * 2654435761L) % 100000L).toDouble / 100.0)
  }.toDF("key", "id", "v")

  private def skRows(df: org.apache.spark.sql.DataFrame) =
    Kmv.sketch(df, "key", "id", "v").as[(String, String, Double)]
      .collect().toSet

  test("merge of arbitrary splits is byte-identical to one-shot") {
    val df = fixture(5000)
    val parts = Seq(
      df.filter(col("id") % 3 === 0),
      df.filter(col("id") % 3 === 1),
      df.filter(col("id") % 3 === 2))
    val merged = Kmv.merge(
      Kmv.merge(Kmv.sketch(parts(0), "key", "id", "v"),
        Kmv.sketch(parts(1), "key", "id", "v")),
      Kmv.sketch(parts(2), "key", "id", "v"))
      .as[(String, String, Double)].collect().toSet
    assert(merged == skRows(df))
  }

  test("replayed batch is a no-op (duplicate-blind)") {
    val df = fixture(2000)
    assert(skRows(df.unionAll(df)) == skRows(df))
  }

  test("state is bounded at k per key") {
    assert(skRows(fixture(5000)).size == Kmv.K)
    // fewer rows than k: keep them all
    assert(skRows(fixture(40)).size == 40)
  }

  test("quantile estimates land within sampling error of exact") {
    val df = fixture(20000)
    val est = Kmv.quantiles(Kmv.sketch(df, "key", "id", "v"),
      Seq(("p10", 0.1), ("p50", 0.5), ("p90", 0.9)))
      .select("p10", "p50", "p90").as[(Double, Double, Double)].head()
    // values are ~uniform on [0, 1000): quantile value ≈ 1000p; allow
    // ±15% of the range at k=128 (≈3σ of the sampling error)
    assert(math.abs(est._1 - 100.0) < 150.0, s"p10=${est._1}")
    assert(math.abs(est._2 - 500.0) < 150.0, s"p50=${est._2}")
    assert(math.abs(est._3 - 900.0) < 150.0, s"p90=${est._3}")
  }

  test("sketch aggregates map-side (ObjectHashAggregate, no window sort)") {
    val plan = Kmv.sketch(Tables.events(spark, sf), "event_type", "event_id", "value")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("fixture query: per-type rows, ordered estimates") {
    val r = Kmv.kmvQuantiles(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (t, m, p10, p50, p90) =>
      assert(m > 0 && m <= Kmv.K, s"$t sample $m")
      assert(p10 <= p50 && p50 <= p90, s"$t estimates not monotone")
    }
  }
}
