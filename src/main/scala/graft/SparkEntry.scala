package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory)
  * and §7 (build plan). Every queries entry has a DuckDB oracle twin.
  */
object SparkEntry {

  /** Flagship on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B. analytics core
    "q1_agg" -> (Analytics.q1Agg _),
    "q3_topn" -> (Analytics.q3TopN _),
    "q5_region" -> (Analytics.q5Region _),
    "q_window_topk" -> (Analytics.windowTopK _),
    "q_events_hourly" -> (Analytics.eventsHourly _),
    "q_sessionize" -> (Analytics.sessionize _),
  )

  /** DuckDB-runnable oracle SQL per queries key (same tables, same
    * column aliases — the driver compare sorts columns by name).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Analytics.q1AggSql,
    "q3_topn" -> Analytics.q3TopNSql,
    "q5_region" -> Analytics.q5RegionSql,
    "q_window_topk" -> Analytics.windowTopKSql,
    "q_events_hourly" -> Analytics.eventsHourlySql,
    "q_sessionize" -> Analytics.sessionizeSql,
  )
}
