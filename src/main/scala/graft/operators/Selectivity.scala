package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Selectivity bracketing from the equi-depth histogram — the
  * [[Analytics.equidepth]] statistic CONSUMED the way an optimizer
  * consumes it: a range predicate's row count is bracketed by
  * [Σ fully-contained buckets, Σ overlapping buckets], with the
  * bracket PROVABLE (every bucket is an order-statistic interval, so
  * a bucket whose [lo, hi] lies inside the predicate contributes all
  * its rows, and one outside contributes none) — where the usual
  * interpolated estimate is a guess with no bound. The exact count
  * rides the same query, so the bracket contract is hash-verified per
  * predicate.
  *
  * Determinism note: bucket bounds are compared UNROUNDED (they are
  * untouched min/max picks of stored doubles — bit-identical on both
  * engines; rounding them first could flip a boundary comparison and
  * break the provable bracket) and never output; the output is
  * integers and booleans only.
  *
  * Scale shape: the histogram build is the `q_equidepth` per-key
  * window (the exact audit form); bracketing folds the ≤types·B
  * bucket frame, and the exact count is one filtered partial agg.
  */
object Selectivity {

  val Lo = 20.0
  val Hi = 60.0

  /** q_selectivity — bracket `value ∈ [Lo, Hi)` per event type. */
  def selectivity(s: SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    val w = byType.orderBy(col("value"), col("event_id"))
    val hist = Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("bucket",
        expr(s"CAST((rn - 1) * ${Analytics.EqDepthBuckets} div n AS INT)"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("c"), min(col("value")).as("blo"),
        max(col("value")).as("bhi"))
    val bracket = hist.groupBy(col("event_type"))
      .agg(
        sum(when(col("blo") >= Lo && col("bhi") < Hi, col("c")).otherwise(0L))
          .as("est_lo"),
        sum(when(col("bhi") >= Lo && col("blo") < Hi, col("c")).otherwise(0L))
          .as("est_hi"))
    val exact = Tables.events(s, d)
      .filter(col("value") >= Lo && col("value") < Hi)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact"))
    bracket.join(exact, Seq("event_type"), "left_outer")
      .select(col("event_type"), col("est_lo"), col("est_hi"),
        coalesce(col("exact"), lit(0L)).as("exact"))
      .withColumn("bracket_holds",
        col("est_lo") <= col("exact") && col("exact") <= col("est_hi"))
      .orderBy(col("event_type"))
  }

  val selectivitySql: String =
    s"""WITH ranked AS (
       |  SELECT event_type, value,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY value, event_id) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events
       |), hist AS (
       |  SELECT event_type,
       |         ((rn - 1) * ${Analytics.EqDepthBuckets} // n)::INT AS bucket,
       |         count(*)::BIGINT AS c, min(value) AS blo, max(value) AS bhi
       |  FROM ranked GROUP BY event_type, bucket
       |), bracket AS (
       |  SELECT event_type,
       |         sum(CASE WHEN blo >= $Lo AND bhi < $Hi THEN c ELSE 0 END)::BIGINT AS est_lo,
       |         sum(CASE WHEN bhi >= $Lo AND blo < $Hi THEN c ELSE 0 END)::BIGINT AS est_hi
       |  FROM hist GROUP BY event_type
       |), ex AS (
       |  SELECT event_type, count(*)::BIGINT AS exact FROM events
       |  WHERE value >= $Lo AND value < $Hi GROUP BY event_type
       |)
       |SELECT b.event_type, b.est_lo, b.est_hi,
       |       coalesce(ex.exact, 0)::BIGINT AS exact,
       |       (b.est_lo <= coalesce(ex.exact, 0) AND
       |        coalesce(ex.exact, 0) <= b.est_hi) AS bracket_holds
       |FROM bracket b LEFT JOIN ex USING (event_type)
       |ORDER BY event_type""".stripMargin
}
