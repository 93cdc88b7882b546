package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality constraint suite — the Deequ-style gate (Schelter et
  * al., VLDB'18 "Automating large-scale data quality verification") a
  * production ingest runs BEFORE curation ever sees a batch: schema
  * and content contracts (completeness, key uniqueness, value ranges,
  * referential integrity, volume) evaluated as metrics with explicit
  * thresholds, one verdict row per check. The reference pipeline's
  * only contract is skip-and-log on a failed file
  * (Notion_openai_vector_etl.py:497-504,744-776); a corpus engine
  * needs the set-level version: don't let a half-null or
  * key-duplicated batch poison the manifest.
  *
  * Scale shape: every metric is a ratio of two DISTRIBUTIVE counts
  * (count, count-non-null, count-in-range fold map-side; the
  * uniqueness numerator is the one two-phase distinct, keyed on the
  * key it audits), so each check is one partial-agg pass and the
  * per-batch metric STATES merge by addition across batches — the
  * [[Relevance.bm25Stats]] contract, which is what lets a nightly
  * verifier audit only the new partitions. Referential integrity is
  * the one join: an anti-join on the foreign key (the [[Analytics]]
  * NOT-EXISTS shape) — both sides bucketed by that key at 100 TB.
  * Verdicts compare the ROUNDED metric (engine-identical decision,
  * the [[Blocklist]] soft-gate rule).
  */
object Dq {

  /** Deterministic dirty fixture: every 13th doc loses `lang`
    * (completeness), every 31st negates `n_chars` (range), every 17th
    * row is duplicated (key uniqueness). SQL mirror: CTE `dirty`.
    */
  def dirtyDocs(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 13 === 0, lit(null)).otherwise(col("lang")).as("lang"),
      when(col("doc_id") % 31 === 0, -col("n_chars")).otherwise(col("n_chars"))
        .as("n_chars"))
    base.unionAll(base.filter(col("doc_id") % 17 === 0))
  }

  val dirtyDocsSql: String =
    """dirty AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang,
      |         CASE WHEN doc_id % 31 = 0 THEN -n_chars ELSE n_chars END AS n_chars
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang,
      |         CASE WHEN doc_id % 31 = 0 THEN -n_chars ELSE n_chars END AS n_chars
      |  FROM documents WHERE doc_id % 17 = 0
      |)""".stripMargin

  private def verdict(name: String, metric: Column, threshold: Double): Column =
    struct(lit(name).as("check_name"), TextSim.r6(metric).as("metric"),
      lit(threshold).as("threshold"),
      (TextSim.r6(metric) >= threshold).as("pass"))

  /** One row per check over a (possibly dirty) doc frame plus the
    * lineitem→orders referential pair. Checks: `lang` completeness ≥
    * 0.95, `doc_id` uniqueness = 1, `n_chars` in [1, 100 000] ≥ 0.99,
    * lineitem.l_orderkey ⊆ orders ≥ 1, volume ≥ 100 rows.
    */
  def suite(docs: DataFrame, lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val docChecks = docs.agg(
      verdict("completeness_lang",
        count(col("lang")).cast("double") / count(lit(1)), 0.95).as("c1"),
      verdict("unique_doc_id",
        countDistinct(col("doc_id")).cast("double") / count(lit(1)), 1.0).as("c2"),
      verdict("range_n_chars",
        sum(when(col("n_chars").between(1, 100000), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 0.99).as("c3"),
      verdict("volume_min_rows", count(lit(1)).cast("double"), 100.0).as("c4"))
    val ri = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("viol"))
      .crossJoin(lineitem.agg(count(lit(1)).as("n")))
      .select(verdict("ri_lineitem_orders",
        lit(1.0) - col("viol").cast("double") / col("n"), 1.0).as("c"))
    docChecks.select(explode(array(col("c1"), col("c2"), col("c3"), col("c4")))
        .as("c"))
      .unionAll(ri)
      .select(col("c.check_name"), col("c.metric"), col("c.threshold"),
        col("c.pass"))
  }

  /** The mergeable face of the three DISTRIBUTIVE doc checks: raw
    * count sums per batch, merged by addition ([[Relevance.bm25Stats]]
    * contract). Uniqueness and RI deliberately stay batch-side — a
    * streaming distinct over an unbounded key set has no bounded
    * state; the nightly verifier owns those.
    */
  def metricState(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n"),
      count(col("lang")).as("nonnull_lang"),
      sum(when(col("n_chars").between(1, 100000), 1L).otherwise(0L))
        .as("in_range"))

  /** Merge any number of [[metricState]] rows — plain addition. */
  def mergeStates(states: DataFrame): DataFrame =
    states.agg(sum(col("n")).as("n"),
      sum(col("nonnull_lang")).as("nonnull_lang"),
      sum(col("in_range")).as("in_range"))

  /** The distributive subset of [[suite]]'s verdicts off a merged
    * state — bit-identical rows to the one-shot suite's
    * completeness/range/volume checks.
    */
  def verdictsFromState(state: DataFrame): DataFrame =
    state.select(explode(array(
      verdict("completeness_lang",
        col("nonnull_lang").cast("double") / col("n"), 0.95),
      verdict("range_n_chars",
        col("in_range").cast("double") / col("n"), 0.99),
      verdict("volume_min_rows", col("n").cast("double"), 100.0))).as("c"))
      .select(col("c.check_name"), col("c.metric"), col("c.threshold"),
        col("c.pass"))

  /** q_dq_checks — the suite over the dirty fixture + the real
    * referential pair (completeness/uniqueness/range fail by
    * construction; RI and volume pass).
    */
  def dqChecks(s: SparkSession, d: String): DataFrame =
    suite(dirtyDocs(s, d), Tables.lineitem(s, d), Tables.orders(s, d))
      .orderBy(col("check_name"))

  val dqChecksSql: String = {
    def r6(e: String) = TextSim.r6Sql(e)
    s"""WITH $dirtyDocsSql,
       |doc_m AS (
       |  SELECT count(lang)::DOUBLE / count(*)::DOUBLE AS compl,
       |         count(DISTINCT doc_id)::DOUBLE / count(*)::DOUBLE AS uniq,
       |         sum(CASE WHEN n_chars BETWEEN 1 AND 100000 THEN 1 ELSE 0 END)::DOUBLE
       |           / count(*)::DOUBLE AS rng,
       |         count(*)::DOUBLE AS vol
       |  FROM dirty
       |),
       |ri_m AS (
       |  SELECT 1.0 - (SELECT count(*) FROM lineitem l
       |                WHERE NOT EXISTS (SELECT 1 FROM orders o
       |                                  WHERE o.o_orderkey = l.l_orderkey))::DOUBLE
       |               / (SELECT count(*) FROM lineitem)::DOUBLE AS ri
       |),
       |checks AS (
       |  -- thresholds ::DOUBLE: a bare 100.0 is DECIMAL in DuckDB and
       |  -- stringifies '100.00' vs Spark's double '100.0'
       |  SELECT 'completeness_lang' AS check_name, ${r6("compl")} AS metric,
       |         0.95::DOUBLE AS threshold FROM doc_m
       |  UNION ALL
       |  SELECT 'unique_doc_id', ${r6("uniq")}, 1.0::DOUBLE FROM doc_m
       |  UNION ALL
       |  SELECT 'range_n_chars', ${r6("rng")}, 0.99::DOUBLE FROM doc_m
       |  UNION ALL
       |  SELECT 'volume_min_rows', ${r6("vol")}, 100.0::DOUBLE FROM doc_m
       |  UNION ALL
       |  SELECT 'ri_lineitem_orders', ${r6("ri")}, 1.0::DOUBLE FROM ri_m
       |)
       |SELECT check_name, metric, threshold, (metric >= threshold) AS pass
       |FROM checks
       |ORDER BY check_name""".stripMargin
  }
}
