package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q_components — the oracle face of [[Components]]: connected
  * components of the (undirected) crawl graph as a per-node label
  * table `(id, lbl, comp_size)`, lbl = min node id of the component.
  * The pairs→clusters step every near-dup pipeline runs
  * ([[Dedup.keepFromLabels]] consumes exactly this shape) — exposed
  * as a query so the iterative min-label fixpoint itself sits under
  * the round's hash gate, not only under unit tests: a propagation
  * bug that converges to a plausible-but-wrong labeling (the failure
  * mode equivalence specs can miss if both sides share the bug)
  * cannot match an independent engine's transitive closure.
  *
  * Scale shape is [[Components.connectedComponents]]'s: per round one
  * edge-keyed join + one min groupBy, rounds bounded by component
  * diameter, labels materialized per round. Component sizes are one
  * |V|-keyed fold broadcast back.
  */
object ComponentsQuery {

  def componentsQuery(s: SparkSession, d: String): DataFrame = {
    val e = Tables.edgesShared(s, d)
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    val labels = Components.connectedComponents(
      nodes, e.select(col("src").as("a_id"), col("dst").as("b_id")))
    val sizes = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).cast("long").as("comp_size"))
    labels.join(broadcast(sizes), "lbl")
      .select(col("id"), col("lbl"), col("comp_size"))
      .orderBy(col("id"))
  }

  val componentsSql: String =
    s"""WITH RECURSIVE ${Tables.edgesSql},
       |und AS (
       |  SELECT src, dst FROM edges
       |  UNION SELECT dst, src FROM edges
       |), nodes AS (
       |  SELECT DISTINCT src AS id FROM und
       |), walk(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT u.dst, w.lbl FROM walk w JOIN und u ON u.src = w.id
       |), labels AS (
       |  SELECT id, min(lbl)::BIGINT AS lbl FROM walk GROUP BY id
       |), sizes AS (
       |  SELECT lbl, count(*)::BIGINT AS comp_size FROM labels GROUP BY lbl
       |)
       |SELECT l.id, l.lbl, s.comp_size
       |FROM labels l JOIN sizes s ON s.lbl = l.lbl
       |ORDER BY l.id""".stripMargin
}
