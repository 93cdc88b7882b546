package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union coverage (the sweep-line "merge overlapping
  * intervals" primitive): per user, the total WALL-CLOCK time covered
  * by the union of their activity intervals — the uptime/engagement
  * measure a sum of durations double-counts (overlapping sessions,
  * retried requests, concurrent devices all overlap) and a
  * sessionizer answers differently (q_sessionize's gap rule merges
  * near-adjacent activity; this merges exactly OVERLAPPING coverage
  * — an SLA/billing semantics, not a behavioral one). Each event
  * contributes [ts, ts + window); merged spans and their coverage
  * fall out of one prefix-max pass.
  *
  * The classic SQL-hard shape made one-pass: per user in start
  * order, an interval starts a NEW merged span iff its start exceeds
  * the running max of prior ends (strictly — touching intervals
  * merge); the span id is the running count of such breaks, and
  * coverage per span is max(end) − min(start). All integer
  * microseconds — no doubles anywhere until the final hours
  * conversion (r6).
  *
  * Scale shape: ONE per-user window (two running folds over the same
  * sort — Spark evaluates both in a single WindowExec pass), one
  * partial-agg groupBy per (user, span), one per-user fold. State is
  * per-user in-flight rows; at 100 TB bucket events by user_id and
  * the sort is the only cost. No join, no self-comparison of
  * intervals (the naive overlap self-join is |events|² per user).
  */
object IntervalUnion {

  /** Interval width: each event covers [ts, ts + 5 min). */
  val WindowUs = 300000000L

  def intervalUnionQuery(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("st"), col("event_id"))
    val spans = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) + WindowUs).as("en"))
      .withColumn("max_end_prev",
        max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("max_end_prev").isNull ||
          col("st") > col("max_end_prev"), 1L).otherwise(0L))
      .withColumn("span_id",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    spans
      .groupBy(col("user_id"), col("span_id"))
      .agg(min(col("st")).as("s0"), max(col("en")).as("e1"),
        count(lit(1)).cast("long").as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(col("n_events")).cast("long").as("n_events"),
        sum(col("e1") - col("s0")).cast("long").as("covered_us"))
      .select(col("user_id"), col("n_spans"), col("n_events"),
        col("covered_us"),
        TextSim.r6(col("covered_us").cast("double") / 3600000000.0)
          .as("covered_hours"))
      .orderBy(col("user_id"))
  }

  val intervalUnionSql: String =
    s"""WITH iv AS (
       |  SELECT user_id, event_id,
       |         epoch_us(ts)::BIGINT AS st,
       |         (epoch_us(ts) + $WindowUs)::BIGINT AS en
       |  FROM events
       |), marked AS (
       |  SELECT user_id, event_id, st, en,
       |         CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
       |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |                OR st > max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
       |                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |              THEN 1 ELSE 0 END AS brk
       |  FROM iv
       |), spans AS (
       |  SELECT user_id, st, en,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY st, event_id
       |                        ROWS UNBOUNDED PRECEDING) AS span_id
       |  FROM marked
       |), per_span AS (
       |  SELECT user_id, span_id, min(st)::BIGINT AS s0, max(en)::BIGINT AS e1,
       |         count(*)::BIGINT AS n_events
       |  FROM spans GROUP BY user_id, span_id
       |)
       |SELECT user_id, count(*)::BIGINT AS n_spans,
       |       sum(n_events)::BIGINT AS n_events,
       |       sum(e1 - s0)::BIGINT AS covered_us,
       |       ${TextSim.r6Sql("sum(e1 - s0)::DOUBLE / 3600000000.0")} AS covered_hours
       |FROM per_span
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
}
