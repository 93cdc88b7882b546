package graft.operators

import graft.Tables
import graft.functions.{Cms, Md5Buckets, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Equi-join cardinality estimation from count-min sketch inner
  * products (Cormode & Muthukrishnan 2005, §4.2) — the query-PLANNING
  * primitive at 100 TB: |A ⋈_k B| = Σ_k f_A(k)·f_B(k), and the CMS
  * row-wise inner product min_r Σ_b cA[r][b]·cB[r][b] estimates it
  * NEVER BELOW the truth (hash collisions only add cross terms) from
  * depth × width counters per side — so "how big is this join, should
  * I broadcast, how many partitions" is answerable from ~2 KB of
  * mergeable state without touching either table, and the state
  * refreshes incrementally under ingest (counter addition, the
  * [[Cms.Sketch.merge]] contract). The same Σ f² inner product of a
  * side with ITSELF is the join-skew diagnostic: self-join size =
  * second frequency moment F₂, the quantity that says whether a key
  * distribution will melt a reducer.
  *
  * Everything is set-at-a-time over tiny frames: each side folds ONCE
  * to its ≤ depth·width counter frame (one digest pass, one
  * partial-agg groupBy — [[Cms.fit]]'s shape, kept as a FRAME so
  * nothing collects); the inner product joins two counter frames and
  * folds to depth rows. Exact ground truth rides the same query via
  * the degree-frame join (Σ cA·cB — never materializing the join
  * itself), so the estimate's never-undercount contract is
  * hash-verified, not just asserted.
  */
object JoinCard {

  /** Per-side CMS counter frame (r, b, c) over a key frame — the
    * mergeable planning state (states add under union of batches).
    */
  def counters(keys: DataFrame, keyCol: String,
    depth: Int = Cms.Depth, width: Long = Cms.Width): DataFrame =
    keys
      .select(posexplode(Md5Buckets.multi(array(col(keyCol).cast("string")),
        width, depth)).as(Seq("r", "b")))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).cast("long").as("c"))

  /** min over rows of the bucket-wise inner product — the join-size
    * estimate as a 1-row frame.
    */
  def estimate(cA: DataFrame, cB: DataFrame): DataFrame =
    cA.select(col("r"), col("b"), col("c").as("ca"))
      .join(cB.select(col("r"), col("b"), col("c").as("cb")), Seq("r", "b"))
      .groupBy(col("r"))
      .agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est_pairs"))

  /** q_join_card — two planning estimates, each hash-checked against
    * its exact degree-join ground truth: the events self-join on
    * user_id (F₂ — the skew diagnostic) and lineitem ⋈ orders on the
    * order key (the FK join a planner sizes before picking a
    * strategy).
    */
  def joinCard(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"))
    val cEv = counters(ev, "user_id").persist()
    val evDeg = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val evExact = evDeg.agg(sum(col("c") * col("c")).as("exact_pairs"))
    val evRow = estimate(cEv, cEv).crossJoin(evExact)
      .select(lit("events_self_user").as("join_name"),
        col("est_pairs"), col("exact_pairs"))

    val lk = Tables.lineitem(s, d).select(col("l_orderkey"))
    val ok = Tables.orders(s, d).select(col("o_orderkey"))
    val cL = counters(lk, "l_orderkey")
    val cO = counters(ok, "o_orderkey")
    val lExact = lk.groupBy(col("l_orderkey")).agg(count(lit(1)).as("cl"))
      .join(ok.groupBy(col("o_orderkey")).agg(count(lit(1)).as("co")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(coalesce(sum(col("cl") * col("co")), lit(0L)).as("exact_pairs"))
    val loRow = estimate(cL, cO).crossJoin(lExact)
      .select(lit("lineitem_orders").as("join_name"),
        col("est_pairs"), col("exact_pairs"))

    evRow.unionByName(loRow)
      .select(col("join_name"), col("est_pairs"), col("exact_pairs"),
        TextSim.r6(col("est_pairs").cast("double") / col("exact_pairs"))
          .as("err_ratio"))
      .orderBy(col("join_name"))
  }

  val joinCardSql: String = {
    def bSql(r: Int, k: String): String =
      s"('0x' || substr(md5($k), ${7 * r + 1}, 7))::BIGINT % ${Cms.Width}"
    def cnts(name: String, src: String): String =
      (0 until Cms.Depth).map { r =>
        s"SELECT $r AS r, ${bSql(r, "k")} AS b, count(*)::BIGINT AS c FROM $src GROUP BY 2"
      }.mkString(s"$name AS (", " UNION ALL ", ")")
    s"""WITH kev AS (SELECT user_id::VARCHAR AS k FROM events),
       |klk AS (SELECT l_orderkey::VARCHAR AS k FROM lineitem),
       |kok AS (SELECT o_orderkey::VARCHAR AS k FROM orders),
       |${cnts("cev", "kev")},
       |${cnts("clk", "klk")},
       |${cnts("cok", "kok")},
       |est_ev AS (
       |  SELECT min(ip)::BIGINT AS est_pairs FROM (
       |    SELECT a.r, sum(a.c * b.c) AS ip
       |    FROM cev a JOIN cev b ON a.r = b.r AND a.b = b.b
       |    GROUP BY a.r)
       |),
       |ex_ev AS (
       |  SELECT sum(c * c)::BIGINT AS exact_pairs FROM (
       |    SELECT count(*)::BIGINT AS c FROM events GROUP BY user_id)
       |),
       |est_lo AS (
       |  SELECT min(ip)::BIGINT AS est_pairs FROM (
       |    SELECT a.r, sum(a.c * b.c) AS ip
       |    FROM clk a JOIN cok b ON a.r = b.r AND a.b = b.b
       |    GROUP BY a.r)
       |),
       |ex_lo AS (
       |  SELECT coalesce(sum(l.c * o.c), 0)::BIGINT AS exact_pairs FROM
       |    (SELECT l_orderkey AS k, count(*)::BIGINT AS c FROM lineitem GROUP BY 1) l
       |    JOIN
       |    (SELECT o_orderkey AS k, count(*)::BIGINT AS c FROM orders GROUP BY 1) o
       |    ON l.k = o.k
       |)
       |SELECT join_name, est_pairs, exact_pairs,
       |       ${TextSim.r6Sql("est_pairs::DOUBLE / exact_pairs::DOUBLE")} AS err_ratio
       |FROM (
       |  SELECT 'events_self_user' AS join_name, est_ev.est_pairs, ex_ev.exact_pairs
       |  FROM est_ev, ex_ev
       |  UNION ALL
       |  SELECT 'lineitem_orders', est_lo.est_pairs, ex_lo.exact_pairs
       |  FROM est_lo, ex_lo
       |)
       |ORDER BY join_name""".stripMargin
  }
}
