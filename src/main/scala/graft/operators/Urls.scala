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
    * host, every 5th carries a trailing slash (which lands BEFORE any
    * query — the `/?` boundary shape), every 3rd an all-tracking
    * query string, every 11th (not also 3rd) a MIXED query whose
    * non-utm params must survive, every 7th a fragment. SQL mirror:
    * CTE `urls`.
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
          .when(col("doc_id") % 11 === 0,
            "?ref=rss&utm_medium=email&page=2")
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
      |         (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=x'
      |               WHEN doc_id % 11 = 0 THEN '?ref=rss&utm_medium=email&page=2'
      |               ELSE '' END) ||
      |         (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
      |  FROM documents
      |)""".stripMargin

  /** Canonical form: lowercase scheme+authority (path stays
    * case-sensitive per RFC 3986), drop fragment, strip `utm_*`
    * tracking params INDIVIDUALLY (non-tracking params survive a
    * mixed query string), normalize the `/?` path/query boundary, and
    * strip the trailing slash — so `h/p/?page=2`, `h/p?page=2` and
    * `h/p?utm_a=1&page=2#f` all collapse to `h/p?page=2`.
    *
    * The utm strip is three passes over the (fragment-free) string:
    * interior `&utm_…` params vanish, then a leading `?utm_…&` hands
    * the `?` to the first surviving param, then an all-utm `?utm_…`
    * remnant drops whole. The boundary fix rewrites `…/?…` at the
    * FIRST `?` only (`[^?]*` cannot cross one), so query content is
    * never touched.
    */
  def canonical(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noMid = regexp_replace(noFrag, "&utm_[^&]*", "")
    val noLead = regexp_replace(noMid, "\\?utm_[^&]*&", "?")
    val noUtm = regexp_replace(noLead, "\\?utm_[^&]*$", "")
    val noBoundary = regexp_replace(noUtm, "^([^?]*)/\\?", "$1?")
    val noSlash = regexp_replace(noBoundary, "/$", "")
    concat(lower(regexp_extract(noSlash, "^[^/]+//[^/]+", 0)),
      regexp_replace(noSlash, "^[^/]+//[^/]+", ""))
  }

  // Same PATTERNS as the Spark side; dialect differences are flags
  // and replacement syntax only. DuckDB's regexp_replace rewrites the
  // FIRST match unless the 'g' flag is passed — the interior-utm pass
  // must take it (several `&utm_…` params in one query); every other
  // pattern matches at most once by construction. Group reference is
  // `\1` (RE2), not `$1`.
  private def canonicalSql(e: String): String = {
    val noFrag = s"regexp_replace($e, '#.*$$', '')"
    val noMid = s"regexp_replace($noFrag, '&utm_[^&]*', '', 'g')"
    val noLead = s"regexp_replace($noMid, '\\?utm_[^&]*&', '?')"
    val noUtm = s"regexp_replace($noLead, '\\?utm_[^&]*$$', '')"
    val noBoundary = s"regexp_replace($noUtm, '^([^?]*)/\\?', '\\1?')"
    val cleaned = s"regexp_replace($noBoundary, '/$$', '')"
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

  /** Synthetic per-host robots rules — deterministic in the source
    * list so both engines derive them independently. Every host
    * carries the longest-match ladder a real robots.txt exercises:
    * `Disallow /p/` (everything), `Allow /p/1` (re-allow a subtree —
    * longer prefix must WIN), and on `src0` the equal-length tie
    * `Allow /p/2` + `Disallow /p/2` (the spec's tie goes to Allow).
    * SQL mirror: CTE `robots`.
    */
  private def robotsRules(s: SparkSession, d: String): DataFrame = {
    val hosts = Tables.documents(s, d)
      .select(concat(col("source"), lit(".example.com")).as("host")).distinct()
    val base = hosts.select(col("host"),
      explode(array(
        struct(lit("/p/").as("prefix"), lit(false).as("allow")),
        struct(lit("/p/1").as("prefix"), lit(true).as("allow")))).as("r"))
      .select(col("host"), col("r.prefix"), col("r.allow"))
    val tie = hosts.filter(col("host") === "src0.example.com")
      .select(col("host"),
        explode(array(
          struct(lit("/p/2").as("prefix"), lit(true).as("allow")),
          struct(lit("/p/2").as("prefix"), lit(false).as("allow")))).as("r"))
      .select(col("host"), col("r.prefix"), col("r.allow"))
    base.unionByName(tie)
  }

  private val robotsRulesSql: String =
    """robots AS (
      |  SELECT h.host, r.prefix, r.allow
      |  FROM (SELECT DISTINCT source || '.example.com' AS host
      |        FROM documents) h
      |  CROSS JOIN (VALUES ('/p/', FALSE), ('/p/1', TRUE)) r(prefix, allow)
      |  UNION ALL
      |  SELECT 'src0.example.com', prefix, allow
      |  FROM (VALUES ('/p/2', TRUE), ('/p/2', FALSE)) t(prefix, allow)
      |  WHERE 'src0.example.com' IN
      |        (SELECT DISTINCT source || '.example.com' FROM documents)
      |)""".stripMargin

  /** q_robots — robots.txt evaluation of the canonical frontier (the
    * crawl-permission gate ahead of [[crawlSchedule]]; the reference
    * fetches an API it owns, a web crawler must not): per keeper URL,
    * the LONGEST matching rule decides (the Google/REP longest-match
    * semantics, RFC 9309 §2.2.2), Allow wins an equal-length tie, no
    * matching rule means allowed. Matching is pure prefix arithmetic
    * (`startswith`), the verdict a struct-argmax over the matched
    * ladder — no regex, no UDF.
    *
    * Scale: the rules table is tiny and broadcasts past the frontier
    * scan (rules per host is bounded by the robots.txt size cap);
    * the prefix-match join fans each URL out to its ≤|ladder|
    * matches and the argmax folds it straight back — no window over
    * the frontier.
    */
  def robots(s: SparkSession, d: String): DataFrame = {
    val keepers = urlFixture(s, d)
      .select(col("doc_id"), canonical(col("url")).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("canon_url"),
        regexp_extract(col("canon_url"), "^https://([^/?]+)", 1).as("host"),
        regexp_extract(col("canon_url"), "^https://[^/?]+(/[^?]*)", 1)
          .as("path"))
    // alias rule cols before the join (fresh names, the house rule)
    val rules = robotsRules(s, d)
      .select(col("host").as("rhost"), col("prefix"), col("allow"))
    keepers.join(broadcast(rules),
      col("host") === col("rhost") &&
        expr("startswith(path, prefix)"), "left_outer")
      .groupBy(col("canon_url"), col("host"), col("path"))
      .agg(max(when(col("prefix").isNotNull,
        struct(length(col("prefix")).as("l"), col("allow").as("a"),
          col("prefix").as("p")))).as("m"))
      .select(col("canon_url"), col("host"), col("path"),
        col("m.p").as("matched_rule"),
        coalesce(col("m.a"), lit(true)).as("allowed"))
      .orderBy(col("canon_url"))
  }

  val robotsSql: String =
    s"""WITH $urlFixtureSql,
       |$robotsRulesSql,
       |keepers AS (
       |  SELECT canon_url,
       |         regexp_extract(canon_url, '^https://([^/?]+)', 1) AS host,
       |         regexp_extract(canon_url, '^https://[^/?]+(/[^?]*)', 1) AS path
       |  FROM (SELECT ${canonicalSql("url")} AS canon_url, min(doc_id)
       |        FROM urls GROUP BY 1)
       |), matched AS (
       |  SELECT k.canon_url, k.host, k.path,
       |         max(CASE WHEN r.prefix IS NOT NULL THEN
       |           {'l': length(r.prefix), 'a': r.allow, 'p': r.prefix}
       |         END) AS m
       |  FROM keepers k LEFT JOIN robots r
       |    ON r.host = k.host AND starts_with(k.path, r.prefix)
       |  GROUP BY k.canon_url, k.host, k.path
       |)
       |SELECT canon_url, host, path, m.p AS matched_rule,
       |       coalesce(m.a, TRUE) AS allowed
       |FROM matched
       |ORDER BY canon_url""".stripMargin

  /** Per-host crawl delay (politeness interval), ms. */
  val CrawlDelayMs = 1000L

  /** q_crawl_schedule — politeness scheduling of the deduped frontier:
    * the reference fetches sequentially with retries
    * (download_with_retries, Notion_openai_vector_etl.py:219-235); a
    * distributed crawler instead fetches EVERYTHING in parallel
    * EXCEPT against the same host, where robots politeness imposes a
    * per-host serial rate. The standard frontier shape (Mercator,
    * Heydon–Najork 2001): one queue per host, next fetch slot =
    * rank-within-host · crawl-delay. Output per keeper URL: host,
    * rank in its host queue (discovery order = keeper doc_id — the
    * reference's insertion-order discipline), the fetch offset in ms,
    * and the host's queue depth (max offset = the host that bounds
    * the crawl's makespan).
    *
    * Scale: canonical-group fold (partial agg) → per-HOST window —
    * partitioned by the natural crawl key, so the rank never global-
    * sorts; at 10^10 URLs each host's queue sorts independently
    * (skewed mega-hosts are exactly the hosts whose politeness delay
    * dominates anyway — compute is not the bottleneck, the delay is).
    */
  def crawlSchedule(s: SparkSession, d: String): DataFrame = {
    val keepers = urlFixture(s, d)
      .select(col("doc_id"), canonical(col("url")).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("keep_id"))
      .withColumn("host",
        regexp_extract(col("canon_url"), "^https://([^/?]+)", 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("keep_id"), col("canon_url"))
    keepers
      .withColumn("rank_in_host", row_number().over(w).cast("long"))
      .withColumn("offset_ms", (col("rank_in_host") - 1L) * CrawlDelayMs)
      .withColumn("host_depth",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("host"))).cast("long"))
      .select(col("canon_url"), col("host"), col("keep_id"),
        col("rank_in_host"), col("offset_ms"), col("host_depth"))
      .orderBy(col("host"), col("rank_in_host"))
  }

  val crawlScheduleSql: String =
    s"""WITH $urlFixtureSql,
       |keepers AS (
       |  SELECT canon_url, min(doc_id) AS keep_id,
       |         regexp_extract(canon_url, '^https://([^/?]+)', 1) AS host
       |  FROM (SELECT doc_id, ${canonicalSql("url")} AS canon_url FROM urls)
       |  GROUP BY canon_url
       |)
       |SELECT canon_url, host, keep_id,
       |       row_number() OVER (PARTITION BY host
       |         ORDER BY keep_id, canon_url)::BIGINT AS rank_in_host,
       |       (row_number() OVER (PARTITION BY host
       |         ORDER BY keep_id, canon_url) - 1)::BIGINT * $CrawlDelayMs
       |         AS offset_ms,
       |       count(*) OVER (PARTITION BY host)::BIGINT AS host_depth
       |FROM keepers
       |ORDER BY host, rank_in_host""".stripMargin
}
