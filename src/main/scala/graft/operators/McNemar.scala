package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** McNemar's test for PAIRED binary outcomes (McNemar 1947, with
  * Edwards' 1948 continuity correction) — the within-subject
  * counterpart of the two-arm tests: did each user's "purchased?"
  * flag FLIP between the first and second half of the observation
  * span? The unpaired tests ([[Events.abtest]], `q_chi2`) would
  * compare the two halves as independent samples and pay the
  * between-user variance; McNemar conditions on the concordant users
  * entirely and asks only whether the DISCORDANT flips are symmetric
  * — b = yes→no vs c = no→yes, χ² = (|b−c|−1)²/(b+c) on 1 df.
  *
  * Determinism — zero doubles anywhere: the half-split boundary is
  * the exact integer midpoint (min_us + max_us) div 2 of the span's
  * epoch-micros (the house `div` rule — double `/` flips users within
  * ~256 µs of the midpoint between engines), the statistic ships as
  * chi2_micro = (|b−c|−1)²·1e6 div (b+c) — exact integer — and the
  * α=0.05 verdict compares against the 1-df critical value 3.841459
  * carried as the integer 3841459. b + c = 0 (no discordant users)
  * gives NULL chi2 and NULL verdict in both engines.
  *
  * Scale: one corpus fold to per-(user, half) purchase flags
  * (user-bucketed partial agg), one fold to the 2×2 table, 1-row
  * readout. The span scalar is a 1-row broadcast, never a shuffle.
  */
object McNemar {

  /** χ²(1 df) critical value at α=0.05, micro-fixed. */
  val Crit05Micro = 3841459L

  def mcnemar(s: SparkSession, d: String): DataFrame =
    mcnemarOf(Tables.events(s, d), "purchase")

  /** The paired flip test for `eventType` over any events frame. */
  private[graft] def mcnemarOf(ev: DataFrame, eventType: String): DataFrame = {
    val span = ev.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi"))
      .select(expr("(lo + hi) div 2").as("mid"))
    val halves = ev.crossJoin(broadcast(span))
      .groupBy(col("user_id"))
      .agg(
        max(when(unix_micros(col("ts")) <= col("mid") &&
          col("event_type") === eventType, 1L).otherwise(0L)).as("y1"),
        max(when(unix_micros(col("ts")) > col("mid") &&
          col("event_type") === eventType, 1L).otherwise(0L)).as("y2"))
    halves.agg(
      count(lit(1)).cast("long").as("n_users"),
      sum(when(col("y1") === 1L && col("y2") === 1L, 1L).otherwise(0L))
        .cast("long").as("n_yy"),
      sum(when(col("y1") === 1L && col("y2") === 0L, 1L).otherwise(0L))
        .cast("long").as("n_yn"),
      sum(when(col("y1") === 0L && col("y2") === 1L, 1L).otherwise(0L))
        .cast("long").as("n_ny"),
      sum(when(col("y1") === 0L && col("y2") === 0L, 1L).otherwise(0L))
        .cast("long").as("n_nn"))
      .withColumn("chi2_micro", when(col("n_yn") + col("n_ny") > 0L,
        expr("""((abs(n_yn - n_ny) - 1) * (abs(n_yn - n_ny) - 1) * 1000000)
                div (n_yn + n_ny)""")))
      .withColumn("significant_05", when(col("chi2_micro").isNotNull,
        (col("chi2_micro") > Crit05Micro).cast("int")))
  }

  val mcnemarSql: String =
    s"""WITH span AS (
       |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
       |), halves AS (
       |  SELECT user_id,
       |         max(CASE WHEN epoch_us(ts) <= s.mid AND event_type = 'purchase'
       |                  THEN 1 ELSE 0 END)::BIGINT AS y1,
       |         max(CASE WHEN epoch_us(ts) > s.mid AND event_type = 'purchase'
       |                  THEN 1 ELSE 0 END)::BIGINT AS y2
       |  FROM events CROSS JOIN span s
       |  GROUP BY user_id
       |), folded AS (
       |  SELECT count(*)::BIGINT AS n_users,
       |         sum(CASE WHEN y1 = 1 AND y2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_yy,
       |         sum(CASE WHEN y1 = 1 AND y2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_yn,
       |         sum(CASE WHEN y1 = 0 AND y2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_ny,
       |         sum(CASE WHEN y1 = 0 AND y2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_nn
       |  FROM halves
       |), stat AS (
       |  SELECT *, CASE WHEN n_yn + n_ny > 0
       |                 THEN ((abs(n_yn - n_ny) - 1) * (abs(n_yn - n_ny) - 1)
       |                       * 1000000) // (n_yn + n_ny)
       |                 END::BIGINT AS chi2_micro
       |  FROM folded
       |)
       |SELECT n_users, n_yy, n_yn, n_ny, n_nn, chi2_micro,
       |       CASE WHEN chi2_micro IS NOT NULL
       |            THEN (chi2_micro > $Crit05Micro)::INT END AS significant_05
       |FROM stat""".stripMargin
}
