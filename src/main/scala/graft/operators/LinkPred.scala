package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adamic–Adar link prediction (Adamic & Adar 2003) over the crawl
  * graph — the graph-ML data operator next to [[Graph.triangles]]'
  * density and [[Hits]]/[[Crawl.pageRank]]'s importance: score every
  * non-adjacent 2-hop pair by Σ_w 1/ln(deg(w)) over common neighbors w
  * (a shared RARE neighbor is strong evidence, a shared hub is weak) —
  * the classic "pages that should link" / related-item signal, and the
  * standard common-neighbor baseline every embedding link predictor is
  * graded against.
  *
  * Determinism: per-center weights are fixed to integer micro units
  * (⌊1e6/ln(deg)+0.5⌋ — one libm call per DISTINCT degree, the bm25
  * rule) before the pair sum, so scores are exact longs; the top page
  * is cut under a total order.
  *
  * Scale shape: wedges enumerate per-center neighbor pairs — one
  * self-join of the adjacency on the center key (shuffle keys on the
  * center; salt through [[Skew.saltedSelfJoin]] if a hub bucket
  * dominates). Per-center volume is deg(w)² — the inherent cost of any
  * common-neighbor method; the `maxDeg` knob drops centers above a
  * ceiling, which is the standard approximation (a shared ultra-hub
  * contributes ~0 weight anyway — exactly the 1/ln rationale). The
  * adjacency anti-join and the weight join key on node ids (bucket by
  * node at 100 TB).
  */
object LinkPred {

  val MinCommon = 2
  val TopN = 50

  /** AA scores over an undirected edge frame `(a, b)` (one row per
    * orientation). Returns non-adjacent pairs with ≥ `minCommon`
    * common neighbors: (u, v, n_common, score_micro).
    */
  def adamicAdar(und: DataFrame, minCommon: Int = MinCommon,
    maxDeg: Long = Long.MaxValue): DataFrame = {
    val deg = und.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    val aaw = deg.filter(col("deg") >= 2 && col("deg") <= maxDeg)
      .select(col("a").as("w"),
        floor(lit(1e6) / log(col("deg").cast("double")) + 0.5)
          .cast("long").as("wgt"))
    val wedges = und.select(col("a").as("w"), col("b").as("u"))
      .join(und.select(col("a").as("w"), col("b").as("v")), Seq("w"))
      .filter(col("u") < col("v"))
      .join(aaw, Seq("w"))
    val pairs = wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"), sum(col("wgt")).as("score_micro"))
    pairs
      .join(und.select(col("a").as("u"), col("b").as("v")), Seq("u", "v"),
        "left_anti")
      .filter(col("n_common") >= minCommon)
  }

  /** q_linkpred — top-50 predicted links of the crawl graph under a
    * total (score desc, u, v) order.
    */
  def linkPred(s: SparkSession, d: String): DataFrame = {
    val e = Tables.edgesShared(s, d)
    val und = e.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(e.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
    adamicAdar(und)
      .orderBy(col("score_micro").desc, col("u"), col("v"))
      .limit(TopN)
  }

  val linkPredSql: String =
    s"""WITH ${Tables.edgesSql},
       |und AS (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT src AS a, dst AS b FROM edges
       |    UNION ALL
       |    SELECT dst AS a, src AS b FROM edges)
       |), deg AS (
       |  SELECT a, count(*)::BIGINT AS deg FROM und GROUP BY a
       |), aaw AS (
       |  SELECT a AS w, floor(1000000.0 / ln(deg::DOUBLE) + 0.5)::BIGINT AS wgt
       |  FROM deg WHERE deg >= 2
       |), wedges AS (
       |  SELECT x.b AS u, y.b AS v, aaw.wgt
       |  FROM und x JOIN und y ON x.a = y.a AND x.b < y.b
       |  JOIN aaw ON aaw.w = x.a
       |), pairs AS (
       |  SELECT u, v, count(*)::BIGINT AS n_common,
       |         sum(wgt)::BIGINT AS score_micro
       |  FROM wedges GROUP BY u, v
       |)
       |SELECT p.u, p.v, p.n_common, p.score_micro
       |FROM pairs p
       |WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.a = p.u AND und.b = p.v)
       |  AND p.n_common >= $MinCommon
       |ORDER BY p.score_micro DESC, p.u, p.v
       |LIMIT $TopN""".stripMargin
}
