package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Functional-dependency profiling — the schema-discovery side of the
  * [[Dq]] constraint gate: a constraint suite can only CHECK contracts
  * someone wrote down; profiling DISCOVERS them (Papenbrock et al.,
  * VLDB'15 — FD discovery is the core of data profiling). For each
  * candidate determinant → dependent pair this reports how close the
  * data comes to the dependency: determinant groups, violating groups
  * (those mapping to >1 dependent value), violating rows beyond each
  * group's majority value, and the hold/violation verdict — an exact
  * FD (zero violations) becomes a [[Dq]] uniqueness-style contract;
  * a NEAR-FD (violation rate under noise level) is usually a data
  * bug worth a quarantine rule.
  *
  * Scale shape: one partial-agg groupBy per candidate on (det, dep)
  * — map-side combined, never a corpus sort — then a ≤|det-groups|
  * fold; the majority count per group is the house argmax
  * (`max(struct(c, dep))`), no window. Candidates are bounded (a
  * profiling run enumerates column pairs — the frame-level API takes
  * any det/dep column pair).
  */
object FdProfile {

  /** Violation profile of one candidate FD over a caller frame. */
  def profile(df: DataFrame, det: String, dep: String): DataFrame = {
    val pairs = df.groupBy(col(det).as("d"), col(dep).as("v"))
      .agg(count(lit(1)).as("c"))
    pairs.groupBy(col("d"))
      .agg(count(lit(1)).as("n_vals"),
        sum(col("c")).as("n_rows"),
        max(struct(col("c"), col("v"))).getField("c").as("majority"))
      .agg(
        lit(s"$det->$dep").as("fd"),
        count(lit(1)).as("n_groups"),
        sum(when(col("n_vals") > 1, 1L).otherwise(0L)).as("viol_groups"),
        (sum(col("n_rows")) - sum(col("majority"))).as("viol_rows"),
        sum(col("n_rows")).as("n_rows"))
      .withColumn("holds", col("viol_rows") === 0L)
      .withColumn("viol_rate",
        TextSim.r6(col("viol_rows").cast("double") / col("n_rows")))
  }

  /** q_fd_profile — candidate dependencies over the documents
    * metadata (+ the derived 400-char size band): doc_id → source
    * holds exactly (the key), source → lang and lang → size band
    * violate at corpus-visible rates.
    */
  def fdProfile(s: SparkSession, d: String): DataFrame = {
    val m = Tables.documents(s, d).select(
      col("doc_id"), col("source"), col("lang"),
      expr(s"n_chars div ${Kanon.BucketChars}").as("len_bucket"))
    profile(m, "doc_id", "source")
      .unionByName(profile(m, "source", "lang"))
      .unionByName(profile(m, "lang", "len_bucket"))
      .select(col("fd"), col("n_groups"), col("viol_groups"),
        col("viol_rows"), col("n_rows"), col("holds"), col("viol_rate"))
      .orderBy(col("fd"))
  }

  val fdProfileSql: String = {
    def one(det: String, dep: String): String =
      s"""SELECT '$det->$dep' AS fd,
         |       count(*)::BIGINT AS n_groups,
         |       sum(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END)::BIGINT AS viol_groups,
         |       (sum(n_rows) - sum(majority))::BIGINT AS viol_rows,
         |       sum(n_rows)::BIGINT AS n_rows,
         |       (sum(n_rows) - sum(majority)) = 0 AS holds,
         |       ${TextSim.r6Sql("(sum(n_rows) - sum(majority))::DOUBLE / sum(n_rows)::DOUBLE")} AS viol_rate
         |FROM (
         |  SELECT d, count(*)::BIGINT AS n_vals, sum(c)::BIGINT AS n_rows,
         |         max({'c': c, 'v': v}).c AS majority
         |  FROM (
         |    SELECT $det AS d, $dep AS v, count(*)::BIGINT AS c
         |    FROM meta GROUP BY 1, 2)
         |  GROUP BY d)""".stripMargin
    s"""WITH meta AS (
       |  SELECT doc_id, source, lang,
       |         n_chars // ${Kanon.BucketChars} AS len_bucket
       |  FROM documents
       |)
       |SELECT * FROM (
       |${one("doc_id", "source")}
       |UNION ALL
       |${one("source", "lang")}
       |UNION ALL
       |${one("lang", "len_bucket")}
       |)
       |ORDER BY fd""".stripMargin
  }
}
