package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-graph health statistics over the crawl link graph — the
  * one-row numbers a crawl operator tracks week over week, next to the
  * per-node views ([[Graph.degrees]], `q_triangles`) and the spectral
  * ones (`q_pagerank`): reciprocity (directed mutual-link fraction — a
  * link-exchange/spam-ring signal when it spikes), degree
  * assortativity (Newman 2002: do hubs link hubs? web graphs are
  * typically disassortative; a crawler trapped in a mesh-like farm
  * sees it go positive), and the modularity of the label-propagation
  * communities (Newman–Girvan 2004: did `q_labelprop` find real
  * structure, or noise? Q near 0 = no better than random).
  *
  * Determinism discipline: every moment (Σx, Σxy, Σx², edge and
  * degree masses) folds as exact BIGINTs — only the final Pearson /
  * modularity division happens in double, r6-rounded (the `q_anomaly`
  * rule). Modularity is exactly representable as an integer numerator
  * over 4m²: Q·4m² = Σ_c (4·m·m_c − D_c²), so the oracle compares
  * integers and one rounded double.
  *
  * Scale shape: reciprocity is one self-semi-join on the reversed
  * edge key; assortativity joins the edge list to the ≤|V| degree
  * frame on each endpoint (bucket by node at 100 TB) and folds
  * map-side to one moment row; modularity reuses the [[Graph.labelProp]]
  * labels (id-keyed joins) and folds per community then to one row.
  * Nothing holds more than a 1-row frame after the folds.
  */
object GraphStats {

  /** q_graph_stats — reciprocity + degree assortativity, one row. */
  def graphStats(s: SparkSession, d: String): DataFrame = {
    val e = Tables.edgesShared(s, d)
    val recip = e.join(
      e.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("n_recip"))
    val totals = e.agg(count(lit(1)).as("n_edges"))
    // undirected view for assortativity: both orientations, deduped
    val sym = e.select(col("src"), col("dst"))
      .unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("dg"))
    val pairs = sym
      .join(deg.select(col("node").as("src"), col("dg").as("x")), "src")
      .join(deg.select(col("node").as("dst"), col("dg").as("y")), "dst")
    val moments = pairs.agg(
      count(lit(1)).as("m"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    // degenerate-variance guard (r11 sf1 finding): at 10× the mod-150
    // fixture graph goes COMPLETE, every degree equals |V|−1, both
    // variances hit exactly 0 and ANSI double division throws. The
    // guard tests m·sxx−sx² / m·syy−sy² EXACTLY on decimal(38,0)
    // (m·sxx ~ |E|·deg² overflows int64 on billion-edge graphs) and
    // reports NULL — the q_abtest degenerate rule; a regular graph
    // genuinely has no assortativity. Non-degenerate values keep the
    // identical double expression (tri-SF hashes unchanged).
    val vx = col("m").cast("decimal(38,0)") * col("sxx") -
      col("sx").cast("decimal(38,0)") * col("sx")
    val vy = col("m").cast("decimal(38,0)") * col("syy") -
      col("sy").cast("decimal(38,0)") * col("sy")
    moments.crossJoin(broadcast(recip)).crossJoin(broadcast(totals))
      .select(
        col("n_edges"),
        col("n_recip"),
        when(col("n_edges") > 0,
          TextSim.r6(col("n_recip").cast("double") / col("n_edges")))
          .as("reciprocity"),
        when(vx > 0 && vy > 0,
          TextSim.r6(
            (col("m").cast("double") * col("sxy") - col("sx").cast("double") * col("sy")) /
              sqrt((col("m").cast("double") * col("sxx") - col("sx").cast("double") * col("sx")) *
                (col("m").cast("double") * col("syy") - col("sy").cast("double") * col("sy")))))
          .as("assortativity"))
  }

  val graphStatsSql: String =
    s"""WITH ${Tables.edgesSql},
       |recip AS (
       |  SELECT count(*)::BIGINT AS n_recip FROM edges e
       |  WHERE EXISTS (SELECT 1 FROM edges r
       |                WHERE r.src = e.dst AND r.dst = e.src)
       |),
       |tot AS (SELECT count(*)::BIGINT AS n_edges FROM edges),
       |sym AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT dst AS src, src AS dst FROM edges
       |),
       |deg AS (SELECT src AS node, count(*)::BIGINT AS dg FROM sym GROUP BY 1),
       |mom AS (
       |  SELECT count(*)::BIGINT AS m,
       |         sum(dx.dg)::BIGINT AS sx, sum(dy.dg)::BIGINT AS sy,
       |         sum(dx.dg * dy.dg)::BIGINT AS sxy,
       |         sum(dx.dg * dx.dg)::BIGINT AS sxx,
       |         sum(dy.dg * dy.dg)::BIGINT AS syy
       |  FROM sym s
       |  JOIN deg dx ON dx.node = s.src
       |  JOIN deg dy ON dy.node = s.dst
       |)
       |SELECT tot.n_edges, recip.n_recip,
       |       CASE WHEN tot.n_edges > 0 THEN ${TextSim.r6Sql(
      "recip.n_recip::DOUBLE / tot.n_edges::DOUBLE")} END AS reciprocity,
       |       CASE WHEN mom.m::HUGEINT * mom.sxx - mom.sx::HUGEINT * mom.sx > 0
       |             AND mom.m::HUGEINT * mom.syy - mom.sy::HUGEINT * mom.sy > 0
       |            THEN ${TextSim.r6Sql(
      "(mom.m::DOUBLE * mom.sxy::DOUBLE - mom.sx::DOUBLE * mom.sy::DOUBLE) / " +
        "sqrt((mom.m::DOUBLE * mom.sxx::DOUBLE - mom.sx::DOUBLE * mom.sx::DOUBLE) * " +
        "(mom.m::DOUBLE * mom.syy::DOUBLE - mom.sy::DOUBLE * mom.sy::DOUBLE))")} END AS assortativity
       |FROM mom, recip, tot""".stripMargin

  /** q_modularity — Newman–Girvan modularity of the `q_labelprop`
    * communities on the same thinned fixture subgraph, in exact
    * integer arithmetic: Q·4m² = Σ_c (4·m·m_c − D_c²) folds as
    * BIGINTs (overflow bound: 4·m·m_c < 2⁶³ needs m < ~2³⁰·√1 — fine
    * to billions of edges), only the final Q division is double.
    */
  def modularity(s: SparkSession, d: String): DataFrame =
    modularityOf(Tables.edgesShared(s, d)
      .filter((col("src") + col("dst")) % 4 === 0))

  /** [[modularity]] over any `(src, dst)` edge frame (undirected,
    * labeled by [[Graph.labelProp]] on the same frame).
    */
  def modularityOf(edges: DataFrame): DataFrame = {
    val thinned = edges
    val labels = Graph.labelProp(thinned).persist()
    val sym = thinned.select(col("src"), col("dst"))
      .unionAll(thinned.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    // m = undirected edge count (sym has both orientations)
    val m = sym.agg(expr("CAST(count(1) div 2 AS BIGINT)").as("m"))
    val deg = sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("dg"))
    val dMass = labels.join(deg, "node")
      .groupBy(col("label")).agg(sum(col("dg")).as("d_c"))
    // intra-community edge mass: sym rows whose two endpoints share a
    // label (= 2·m_c per community)
    val intra = sym
      .join(labels.select(col("node").as("src"), col("label").as("la")), "src")
      .join(labels.select(col("node").as("dst"), col("label").as("lb")), "dst")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("intra2"))
    val perC = dMass.join(intra, Seq("label"), "left_outer")
      .select(col("label"), col("d_c"),
        coalesce(col("intra2"), lit(0L)).as("intra2"))
      .crossJoin(broadcast(m))
      // 4·m·m_c − D_c² = 2·m·intra2 − D_c²
      .select(col("label"),
        (lit(2L) * col("m") * col("intra2") - col("d_c") * col("d_c"))
          .as("contrib"))
    perC.agg(count(lit(1)).as("n_communities"),
      sum(col("contrib")).as("q_num"))
      .crossJoin(broadcast(m))
      .select(col("m").as("n_edges"), col("n_communities"), col("q_num"),
        TextSim.r6(col("q_num").cast("double") /
          (lit(4.0) * col("m").cast("double") * col("m").cast("double")))
          .as("modularity"))
  }

  val modularitySql: String = {
    val rounds = (1 to Graph.LpaRounds).map { i =>
      s"""l$i AS (
         |  SELECT node, label FROM (
         |    SELECT s.dst AS node, l.label, count(*) AS c,
         |           row_number() OVER (PARTITION BY s.dst
         |             ORDER BY count(*) DESC, l.label) AS rk
         |    FROM l${i - 1} l JOIN sym s ON s.src = l.node
         |    GROUP BY s.dst, l.label)
         |  WHERE rk = 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Tables.edgesSql},
       |thinned AS (
       |  SELECT src, dst FROM edges WHERE (src + dst) % 4 = 0
       |),
       |sym AS (
       |  SELECT src, dst FROM thinned
       |  UNION
       |  SELECT dst AS src, src AS dst FROM thinned
       |), l0 AS (
       |  SELECT DISTINCT src AS node, src AS label FROM sym
       |),
       |$rounds,
       |m AS (SELECT (count(*) // 2)::BIGINT AS m FROM sym),
       |deg AS (SELECT src AS node, count(*)::BIGINT AS dg FROM sym GROUP BY 1),
       |dmass AS (
       |  SELECT l.label, sum(d.dg)::BIGINT AS d_c
       |  FROM l${Graph.LpaRounds} l JOIN deg d USING (node)
       |  GROUP BY l.label
       |),
       |intra AS (
       |  SELECT la.label, count(*)::BIGINT AS intra2
       |  FROM sym s
       |  JOIN l${Graph.LpaRounds} la ON la.node = s.src
       |  JOIN l${Graph.LpaRounds} lb ON lb.node = s.dst
       |  WHERE la.label = lb.label
       |  GROUP BY la.label
       |),
       |perc AS (
       |  SELECT d.label,
       |         2 * m.m * coalesce(i.intra2, 0) - d.d_c * d.d_c AS contrib
       |  FROM dmass d LEFT JOIN intra i USING (label), m
       |)
       |SELECT m.m AS n_edges,
       |       (SELECT count(*) FROM perc)::BIGINT AS n_communities,
       |       (SELECT sum(contrib) FROM perc)::BIGINT AS q_num,
       |       ${TextSim.r6Sql(
      "(SELECT sum(contrib) FROM perc)::DOUBLE / (4.0 * m.m::DOUBLE * m.m::DOUBLE)")} AS modularity
       |FROM m""".stripMargin
  }
}
