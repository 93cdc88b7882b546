package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * pairs→clusters step every near-dup pipeline needs to materialize an
  * actual deduplicated corpus (candidate pairs alone don't say which
  * copy survives).
  *
  * Shape per round: one join of the current labels with the symmetric
  * edge list (shuffle on the edge key) + one min-label groupBy (partial
  * map-side). Labels only ever decrease, so the fixpoint check is a
  * strict count of decreased labels; rounds are bounded by the cluster
  * diameter — for dedup graphs (near-cliques from LSH buckets) that's
  * 2-3 rounds, never the corpus size. Each round's labels are
  * materialized via [[Iterate.materialize]] like the [[Crawl.bfs]]
  * frontier.
  */
object Components {

  /** Labels every node with the minimum node id reachable from it.
    *
    * @param nodes single-column `id` frame (every node, incl. isolated)
    * @param pairs undirected edges as `a_id`, `b_id`
    * @return (id, lbl) where lbl = min id of the component
    */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
    checkpointDir: Option[String] = None): DataFrame = {
    val sym = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionAll(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .persist()
    var labels = Iterate.materialize(
      nodes.select(col("id"), col("id").as("lbl")), checkpointDir)
    var changed = 1L
    while (changed > 0) {
      val viaEdges = labels.join(sym, labels("id") === sym("src"))
        .select(sym("dst").as("id"), labels("lbl").as("lbl"))
      val next = Iterate.materialize(
        labels.unionAll(viaEdges).groupBy(col("id"))
          .agg(min(col("lbl")).as("lbl")), checkpointDir)
      changed = next.join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") < col("prev")).count()
      labels = next
    }
    sym.unpersist()
    labels
  }
}
