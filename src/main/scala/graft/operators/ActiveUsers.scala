package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily active / new / cumulative-distinct users — the growth
  * dashboard trio over the event stream. Cumulative distinct is the
  * classic running-count-distinct trap: a window COUNT(DISTINCT) over
  * an expanding frame rescans every prefix. Set-at-a-time it
  * decomposes exactly: each user contributes to the cumulative count
  * on their FIRST day (one groupBy min), so cumulative distinct =
  * running sum of first-appearance counts — two partial-agg folds and
  * one window over the ≤|days| frame (the window is global but
  * day-bounded; at years of data it is thousands of rows).
  *
  * Shuffles: (day, user) dedup and the per-user min-day fold both key
  * on user/day columns with map-side partials; nothing scans twice.
  */
object ActiveUsers {

  /** q_active_users — per day: events, DAU, first-time users, and
    * cumulative distinct users ever seen.
    */
  def activeUsers(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
    val daily = ev.groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("dau"))
    val firstDay = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = graft.functions.GridWindow.ord(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(firstDay, Seq("day"), "left_outer")
      .select(col("day"), col("n_events"), col("dau"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  val activeUsersSql: String =
    """WITH ev AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events
      |), daily AS (
      |  SELECT day, count(*)::BIGINT AS n_events,
      |         count(DISTINCT user_id)::BIGINT AS dau
      |  FROM ev GROUP BY day
      |), first_day AS (
      |  SELECT day, count(*)::BIGINT AS new_users FROM (
      |    SELECT user_id, min(day) AS day FROM ev GROUP BY user_id)
      |  GROUP BY day
      |)
      |SELECT d.day, d.n_events, d.dau,
      |       coalesce(f.new_users, 0)::BIGINT AS new_users,
      |       sum(coalesce(f.new_users, 0)) OVER (ORDER BY d.day
      |         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_users
      |FROM daily d LEFT JOIN first_day f USING (day)
      |ORDER BY d.day""".stripMargin
}
