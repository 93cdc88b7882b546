package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl-snapshot latest-wins dedup — the REVISIT face of incremental
  * ingest. A crawler fetches the same page repeatedly across snapshot
  * generations (CommonCrawl's weekly revisits; the reference refetches
  * any file whose `last_edited_time` moved,
  * Notion_openai_vector_etl.py:189-215,678-739); before curation the
  * corpus must collapse each page's fetch history to one authoritative
  * row, and the HISTORY itself is signal — how often a page is
  * refetched and whether its content actually moved is the crawl
  * scheduler's revisit-priority input (stable pages get longer revisit
  * intervals).
  *
  * Per page: fetch count, distinct content versions, the kept (latest)
  * fetch, and a changed flag. Keep-latest is the house argmax —
  * `max(struct(ts, hash))` inside the ONE partial-agg groupBy, never a
  * window over the fetch log ([[Dedup.keepBestFrom]]'s rule applied to
  * time); a page's fetch timestamps are distinct by construction so
  * the argmax is well-defined.
  *
  * Scale shape: one shuffle on the page key with map-side partials —
  * fetch logs are append-only and petabyte-scale, but each page folds
  * to one row before the exchange; the distinct-version count is the
  * only two-phase term and stays keyed on the same column. At 100 TB
  * the log is bucketed by page key and the exchange disappears.
  */
object Snapshots {

  /** Deterministic multi-generation fetch log: every doc fetched at
    * gen 0; every 3rd refetched at gen 1 (content EDITED only for
    * every 6th — the rest are no-change revisits); every 9th fetched
    * again at gen 2, always edited. SQL mirror: CTE `snapshots`.
    */
  def fetchLog(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val g0 = base.select(col("doc_id"),
      (lit(100L) + col("doc_id") % 50).as("ts"), md5(col("text")).as("hash"))
    val g1 = base.filter(col("doc_id") % 3 === 0).select(col("doc_id"),
      (lit(200L) + col("doc_id") % 50).as("ts"),
      when(col("doc_id") % 6 === 0, md5(concat(col("text"), lit("v2"))))
        .otherwise(md5(col("text"))).as("hash"))
    val g2 = base.filter(col("doc_id") % 9 === 0).select(col("doc_id"),
      (lit(300L) + col("doc_id") % 50).as("ts"),
      md5(concat(col("text"), lit("v3"))).as("hash"))
    g0.unionAll(g1).unionAll(g2)
  }

  val fetchLogSql: String =
    """snapshots AS (
      |  SELECT doc_id, 100 + doc_id % 50 AS ts, md5(text) AS hash
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 200 + doc_id % 50 AS ts,
      |         CASE WHEN doc_id % 6 = 0 THEN md5(text || 'v2')
      |              ELSE md5(text) END AS hash
      |  FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id, 300 + doc_id % 50 AS ts, md5(text || 'v3') AS hash
      |  FROM documents WHERE doc_id % 9 = 0
      |)""".stripMargin

  /** Latest-wins collapse of a (key, ts, hash) fetch log — generic
    * over caller frames.
    */
  def latestWins(log: DataFrame, keyCol: String): DataFrame =
    log.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_fetches"),
        countDistinct(col("hash")).as("n_versions"),
        max(struct(col("ts"), col("hash"))).as("kept"))
      .select(col(keyCol), col("n_fetches"), col("n_versions"),
        col("kept.ts").as("kept_ts"), col("kept.hash").as("kept_hash"),
        (col("n_versions") > 1).as("changed"))

  /** q_snapshot_dedup — [[latestWins]] over the fixture fetch log. */
  def snapshotDedup(s: SparkSession, d: String): DataFrame =
    latestWins(fetchLog(s, d), "doc_id").orderBy(col("doc_id"))

  val snapshotDedupSql: String =
    s"""WITH $fetchLogSql,
       |folded AS (
       |  SELECT doc_id,
       |         count(*)::BIGINT AS n_fetches,
       |         count(DISTINCT hash)::BIGINT AS n_versions,
       |         max({'ts': ts, 'hash': hash}) AS kept
       |  FROM snapshots GROUP BY doc_id
       |)
       |SELECT doc_id, n_fetches, n_versions,
       |       kept.ts AS kept_ts, kept.hash AS kept_hash,
       |       (n_versions > 1) AS changed
       |FROM folded
       |ORDER BY doc_id""".stripMargin
}
