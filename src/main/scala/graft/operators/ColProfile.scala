package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Univariate column profiling — the first-look summary the rest of
  * the profiling family drills into ([[Dq]] CHECKS declared
  * contracts, [[FdProfile]] finds dependencies, [[FkDiscover]] finds
  * references; this says what each column IS): row count, null count,
  * exact distinct count, lexicographic min/max of the canonical
  * string form, and the majority value with its count (the house
  * `max(struct(c, v))` argmax — no window).
  *
  * Scale shape: each profiled column folds through ONE (value)
  * partial-agg groupBy (map-side combined — the wire carries distinct
  * values, not rows), then a second fold collapses the value frame to
  * one profile row; the profiled list is bounded, the unions are
  * |columns| single-row frames. Values compare as canonical strings
  * so the one output schema covers every column type (categorical
  * profiling semantics; numeric range CONTRACTS belong to [[Dq]]'s
  * range check).
  */
object ColProfile {

  /** (label, table, column) — both engines generate from this list. */
  val Columns: Seq[(String, String, String)] = Seq(
    ("customer.c_mktsegment", "customer", "c_mktsegment"),
    ("customer.c_nationkey", "customer", "c_nationkey"),
    ("orders.o_orderpriority", "orders", "o_orderpriority"),
    ("orders.o_orderstatus", "orders", "o_orderstatus"),
    ("lineitem.l_returnflag", "lineitem", "l_returnflag"),
    ("documents.lang", "documents", "lang"),
    ("documents.source", "documents", "source"),
    ("events.event_type", "events", "event_type"))

  private def profileOne(df: DataFrame, label: String, column: String): DataFrame = {
    val vc = df.select(col(column).cast("string").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    vc.agg(
      lit(label).as("column"),
      sum(col("c")).as("n_rows"),
      coalesce(sum(when(col("v").isNull, col("c"))), lit(0L)).as("n_nulls"),
      count(when(col("v").isNotNull, 1)).as("n_distinct"),
      min(col("v")).as("min_val"),
      max(col("v")).as("max_val"),
      max(when(col("v").isNotNull, struct(col("c"), col("v"))))
        .getField("v").as("top_value"),
      max(when(col("v").isNotNull, struct(col("c"), col("v"))))
        .getField("c").as("top_count"))
  }

  /** q_col_profile — one profile row per column in [[Columns]].
    * events loads through [[Tables.events]] (the TIMESTAMP(NANOS)
    * shim) — the raw reader would reject its ts column even pruned.
    */
  def colProfile(s: SparkSession, d: String): DataFrame =
    Columns.map { case (label, table, column) =>
      val df = if (table == "events") Tables.events(s, d)
        else Tables.table(s, d, table)
      profileOne(df, label, column)
    }.reduce(_ unionAll _).orderBy(col("column"))

  val colProfileSql: String = {
    val parts = Columns.map { case (label, table, column) =>
      s"""SELECT '$label' AS "column",
         |       sum(c)::BIGINT AS n_rows,
         |       coalesce(sum(CASE WHEN v IS NULL THEN c END), 0)::BIGINT AS n_nulls,
         |       count(CASE WHEN v IS NOT NULL THEN 1 END)::BIGINT AS n_distinct,
         |       min(v) AS min_val,
         |       max(v) AS max_val,
         |       max(CASE WHEN v IS NOT NULL THEN {'c': c, 'v': v} END).v AS top_value,
         |       max(CASE WHEN v IS NOT NULL THEN {'c': c, 'v': v} END).c::BIGINT AS top_count
         |FROM (
         |  SELECT $column::VARCHAR AS v, count(*)::BIGINT AS c
         |  FROM $table GROUP BY 1)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$parts
       |)
       |ORDER BY "column"""".stripMargin
  }
}
