package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph crawl — the reference's recursive page traversal
  * (NotionCrawler.crawl_page/crawl_blocks/crawl_database,
  * Notion_openai_vector_etl.py:480-596) re-expressed as frontier BFS:
  * the visited set and frontier are DataFrames, each hop is a join.
  *
  * Scale: each hop shuffles only the frontier (broadcast when small);
  * visited accumulates via union + distinct on the node key. Frontier
  * and visited are persisted per hop and the plan is cut via
  * checkpoint-like materialization to stop lineage growth — at depth
  * 20 on 100 TB of edges the alternative (one giant recursive plan)
  * would not compile, let alone run.
  */
object Crawl {

  /** Min-depth BFS from `roots` over `edges(src, dst)`.
    *
    * Each hop's frontier is materialized via [[Iterate.materialize]]:
    * cuts the iterative lineage and mints fresh attribute ids (so hop
    * N+1's join with `edges` isn't an ambiguous self-join). Pass
    * `checkpointDir` for a reliable cluster run — `localCheckpoint`
    * dies with an executor; `checkpoint` survives it.
    */
  def bfs(edges: DataFrame, roots: DataFrame, maxDepth: Int,
    checkpointDir: Option[String] = None): DataFrame = {
    edges.persist(StorageLevel.MEMORY_AND_DISK)
    // each hop is ONE job: the frontier size rides the materialization
    // as an Observation metric instead of a separate isEmpty scan
    def materializeCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val out = Iterate.materialize(
        df.observe(obs, count(lit(1)).as("n")), checkpointDir)
      (out, obs.get("n").asInstanceOf[Long])
    }
    val (seed, seedN) = materializeCounted(
      roots.select(col("node"), lit(0L).as("depth")))
    var visited = seed
    var frontier = seed
    var frontierN = seedN
    var depth = 0L
    while (depth < maxDepth && frontierN > 0) {
      depth += 1
      val (next, n) = materializeCounted(
        frontier.join(edges, frontier("node") === edges("src"))
          .select(edges("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .select(col("node"), lit(depth).as("depth")))
      if (n > 0) {
        // plain union: both inputs are already materialized, so the
        // visited lineage stays a shallow tree of checkpointed hops —
        // no extra materialization job per hop needed
        visited = visited.unionAll(next)
      }
      frontier = next
      frontierN = n
    }
    edges.unpersist()
    visited
  }

  /** q_crawl_bfs — reachable set with first-visit depth from node 0. */
  def crawlBfs(s: SparkSession, d: String): DataFrame =
    bfs(Tables.edges(s, d),
      s.range(1).select(lit(0L).as("node")), maxDepth = 20)
      .orderBy(col("node"))

  /** Page-limited crawl — the reference's MAX_PAGES guard
    * (Notion_openai_vector_etl.py:600-655 config + crawl loop): BFS,
    * then a deterministic trim to the `maxPages` first-visited nodes
    * (by depth, then node id — the distributed analogue of the
    * reference's insertion-order cutoff).
    */
  def crawlLimited(edges: DataFrame, roots: DataFrame, maxDepth: Int,
    maxPages: Int): DataFrame =
    bfs(edges, roots, maxDepth)
      .orderBy(col("depth"), col("node"))
      .limit(maxPages)

  /** q_crawl_limited — the MAX_PAGES guard as an oracle query: BFS from
    * node 0 trimmed to the first 40 pages in (depth, node) order — the
    * deterministic distributed analogue of the reference's
    * insertion-order cutoff.
    */
  def crawlLimitedQuery(s: SparkSession, d: String): DataFrame =
    crawlLimited(Tables.edges(s, d),
      s.range(1).select(lit(0L).as("node")), maxDepth = 20, maxPages = 40)
      .orderBy(col("depth"), col("node"))

  val crawlLimitedSql: String =
    s"""WITH RECURSIVE ${Tables.edgesSql},
       |walk(node, depth) AS (
       |  SELECT 0::BIGINT, 0::BIGINT
       |  UNION
       |  SELECT e.dst, w.depth + 1
       |  FROM walk w JOIN edges e ON e.src = w.node
       |  WHERE w.depth < 20
       |)
       |SELECT node, min(depth) AS depth FROM walk
       |GROUP BY node ORDER BY depth, node LIMIT 40""".stripMargin

  val crawlBfsSql: String =
    s"""WITH RECURSIVE ${Tables.edgesSql},
       |walk(node, depth) AS (
       |  SELECT 0::BIGINT, 0::BIGINT
       |  UNION
       |  SELECT e.dst, w.depth + 1
       |  FROM walk w JOIN edges e ON e.src = w.node
       |  WHERE w.depth < 20
       |)
       |SELECT node, min(depth) AS depth FROM walk
       |GROUP BY node ORDER BY node""".stripMargin
}
