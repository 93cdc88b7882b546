package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini concentration of token mass across a source's documents — the
  * INEQUALITY scalar of the mixing family: `q_domain_mix` reports how
  * much each source contributes, `q_histogram`/`q_equidepth` show the
  * length distribution's shape, this one number says how UNEVENLY a
  * source's mass sits on its documents. G ≈ 0: uniform docs (token
  * budgets spread predictably); G → 1: a few giants carry the source
  * (packing bins churn, dedup keep-best decisions dominate the mass,
  * and a handful of documents steer the domain's gradient share).
  * The economist's Lorenz/Gini, applied to corpus curation.
  *
  * Exactness: with docs sorted ascending by token count, G =
  * (2Σᵢ i·xᵢ − (n+1)Σx) / (n·Σx). Ties make per-row ranks ambiguous,
  * so the fold runs on the (source, token-count) VALUE grid: a tie
  * block of c docs at value v after a docs contributes
  * v·(2ca + c(c+1)) to the doubled rank-weighted sum — every term a
  * BIGINT, no per-row rank, no ambiguity. One r6 division at the end;
  * single-doc sources report G = 0 (n·Σx > 0 always holds after the
  * nonempty filter).
  *
  * Scale shape: one corpus fold to (source, toks, cnt) cells; the
  * running-sum window orders each source's DISTINCT count values (the
  * `q_auc` grid discipline — bounded by the value grid, not the doc
  * count); the final fold is ≤|sources| rows.
  */
object Gini {

  def giniQuery(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .select(col("source"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("source"), size(col("t")).cast("long").as("toks"))
      .groupBy(col("source"), col("toks"))
      .agg(count(lit(1)).cast("long").as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("toks"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = cells
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("a", col("cum") - col("c"))
      .withColumn("wr2",
        col("toks") * (lit(2L) * col("c") * col("a") +
          col("c") * (col("c") + 1L)))
    blocks.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_docs"),
        sum(col("c") * col("toks")).cast("long").as("total_toks"),
        sum(col("wr2")).cast("long").as("sr2"))
      .select(col("source"), col("n_docs"), col("total_toks"),
        TextSim.r6(
          (col("sr2") - (col("n_docs") + 1L) * col("total_toks")).cast("double") /
            (col("n_docs").cast("double") * col("total_toks").cast("double")))
          .as("gini"))
      .orderBy(col("source"))
  }

  val giniSql: String =
    s"""WITH cells AS (
       |  SELECT source, toks, count(*)::BIGINT AS c
       |  FROM (SELECT source,
       |               len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS toks
       |        FROM documents)
       |  WHERE toks >= 1
       |  GROUP BY source, toks
       |), blocks AS (
       |  SELECT source, toks, c,
       |         (sum(c) OVER (PARTITION BY source ORDER BY toks
       |                       ROWS UNBOUNDED PRECEDING) - c)::BIGINT AS a
       |  FROM cells
       |), agg AS (
       |  SELECT source, sum(c)::BIGINT AS n_docs,
       |         sum(c * toks)::BIGINT AS total_toks,
       |         sum(toks * (2 * c * a + c * (c + 1)))::BIGINT AS sr2
       |  FROM blocks GROUP BY source
       |)
       |SELECT source, n_docs, total_toks,
       |       ${TextSim.r6Sql(
      "(sr2 - (n_docs + 1) * total_toks)::DOUBLE / (n_docs::DOUBLE * total_toks::DOUBLE)")} AS gini
       |FROM agg
       |ORDER BY source""".stripMargin
}
