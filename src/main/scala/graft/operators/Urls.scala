package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the crawl-frontier twin
  * of content dedup: the same page reached as `HTTPS://Host/p/1/?utm=x#f`
  * and `https://host/p/1` must collapse BEFORE fetch (recrawling costs
  * network, not just storage). The reference normalizes URLs per row
  * (safe_filename / display_name_from_url / extract_id_from_notion_url,
  * Notion_openai_vector_etl.py:63-69,141-154); this is the corpus-level
  * form over a crawl frontier.
  *
  * Scale shape: canonicalization is a fused per-row regex chain riding
  * the scan (the [[Scrub]] pattern); the dup-group report is ONE
  * partial-agg groupBy on the canonical key. Identical regex dialect
  * subset both engines (char classes + anchors, no lookaround).
  */
object Urls {

  /** Deterministic crawl-frontier fixture derived from doc_id/source
    * (the corpus has no URL column): every 4th URL uppercases its
    * host, every 5th carries a trailing slash, every 3rd a tracking
    * query string, every 7th a fragment. SQL mirror: CTE `urls`.
    */
  private def urlFixture(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(
        when(col("doc_id") % 4 === 0,
          concat(lit("HTTPS://"), upper(col("source"))))
          .otherwise(concat(lit("https://"), col("source"))),
        lit(".example.com/p/"), (col("doc_id") % 100).cast("string"),
        when(col("doc_id") % 5 === 0, "/").otherwise(""),
        when(col("doc_id") % 3 === 0, "?utm_source=feed&utm_campaign=x")
          .otherwise(""),
        when(col("doc_id") % 7 === 0, "#frag").otherwise("")).as("url"))

  // `||` kept at end-of-line: this snippet is embedded in a template
  // that stripMargins AGAIN, which would eat a leading `|` of `||`.
  private val urlFixtureSql: String =
    """urls AS (
      |  SELECT doc_id,
      |         (CASE WHEN doc_id % 4 = 0 THEN 'HTTPS://' || upper(source)
      |               ELSE 'https://' || source END) ||
      |         '.example.com/p/' || (doc_id % 100) ||
      |         (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
      |         (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=x' ELSE '' END) ||
      |         (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
      |  FROM documents
      |)""".stripMargin

  /** Canonical form: lowercase scheme+authority (path stays
    * case-sensitive per RFC 3986), drop fragment, drop tracking query
    * params (all-`utm_`-prefixed query strings removed whole), strip
    * the trailing slash.
    */
  def canonical(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "\\?utm_[^#]*$", "")
    val noSlash = regexp_replace(noUtm, "/$", "")
    concat(lower(regexp_extract(noSlash, "^[^/]+//[^/]+", 0)),
      regexp_replace(noSlash, "^[^/]+//[^/]+", ""))
  }

  private def canonicalSql(e: String): String = {
    val cleaned =
      s"regexp_replace(regexp_replace(regexp_replace($e, '#.*$$', ''), '\\?utm_[^#]*$$', ''), '/$$', '')"
    s"lower(regexp_extract($cleaned, '^[^/]+//[^/]+', 0)) || regexp_replace($cleaned, '^[^/]+//[^/]+', '')"
  }

  /** q_url_canon — canonical-URL dup groups over the frontier fixture:
    * canonical url, raw-variant count, and the keeper (min doc_id)
    * that gets fetched.
    */
  def urlCanon(s: SparkSession, d: String): DataFrame =
    urlFixture(s, d)
      .select(col("doc_id"), canonical(col("url")).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).cast("long").as("n_urls"),
        min(col("doc_id")).as("keep_id"))
      .orderBy(col("canon_url"))

  val urlCanonSql: String =
    s"""WITH $urlFixtureSql
       |SELECT ${canonicalSql("url")} AS canon_url,
       |       count(*)::BIGINT AS n_urls,
       |       min(doc_id) AS keep_id
       |FROM urls
       |GROUP BY 1
       |ORDER BY canon_url""".stripMargin
}
