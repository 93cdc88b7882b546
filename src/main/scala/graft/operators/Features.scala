package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series feature generation — the lag/rolling-window
  * primitive of ML feature pipelines (and the batch twin of what
  * [[StreamingAsOf]] serves online: "the user's recent behavior as of
  * this event"): previous value, delta, event-time gap, and the
  * trailing 3-event rolling mean, one feature row per event.
  *
  * Determinism: the rolling mean is the decimal-sum of the last three
  * values divided by their exact count, r6-rounded (a double window
  * avg folds in frame order — [[TextSim.dsum]] is the house fix);
  * ordering ties break on event_id.
  *
  * Scale shape: ONE shuffle on the key (the sessionize window), all
  * features ride the same in-partition sort — adding a feature adds
  * zero exchanges; at 100 TB the events table is bucketed by user and
  * the exchange disappears.
  */
object Features {

  /** Feature frame over `(user_id, event_id, ts, value)` events. */
  def lagFeatures(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val w3 = w.rowsBetween(-2, 0)
    events
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("delta_r6",
        TextSim.r6(col("value") - col("prev_value")))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("roll3_n", count(lit(1)).over(w3))
      .withColumn("roll3_mean_r6",
        TextSim.r6(sum(col("value").cast("decimal(20,6)")).over(w3)
          .cast("double") / col("roll3_n")))
      .select(col("user_id"), col("event_id"),
        TextSim.r6(col("prev_value")).as("prev_value_r6"), col("delta_r6"),
        col("gap_us"), col("roll3_n"), col("roll3_mean_r6"))
  }

  /** q_lag_features — the feature frame of the events table. */
  def lagFeaturesQuery(s: SparkSession, d: String): DataFrame =
    lagFeatures(Tables.events(s, d))
      .orderBy(col("user_id"), col("event_id"))

  val lagFeaturesSql: String =
    s"""WITH f AS (
       |  SELECT user_id, event_id,
       |         lag(value) OVER w AS prev_value,
       |         value - lag(value) OVER w AS delta,
       |         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
       |         count(*) OVER w3 AS roll3_n,
       |         sum(value::DECIMAL(20,6)) OVER w3 AS roll3_sum
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       |         w3 AS (PARTITION BY user_id ORDER BY ts, event_id
       |                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       |)
       |SELECT user_id, event_id,
       |       ${TextSim.r6Sql("prev_value")} AS prev_value_r6,
       |       ${TextSim.r6Sql("delta")} AS delta_r6,
       |       gap_us::BIGINT AS gap_us,
       |       roll3_n::BIGINT AS roll3_n,
       |       ${TextSim.r6Sql("roll3_sum::DOUBLE / roll3_n")} AS roll3_mean_r6
       |FROM f
       |ORDER BY user_id, event_id""".stripMargin
}
