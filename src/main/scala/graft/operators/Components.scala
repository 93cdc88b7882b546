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
    val sym = symmetric(pairs).persist()
    // seed with min(self, direct neighbours): one groupBy, and the
    // common dedup shape (star clusters around the min id) converges at
    // the seed — a full propagation round saved every run
    val minNbr = sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
    val seed = nodes.join(minNbr, nodes("id") === minNbr("src"), "left_outer")
      .select(nodes("id"),
        least(nodes("id"), coalesce(col("mn"), nodes("id"))).as("lbl"))
    val labels = propagate(sym, seed, checkpointDir)
    sym.unpersist()
    labels
  }

  /** [[connectedComponents]] restricted to nodes that appear in a pair
    * — every member IS an edge src after symmetrization, so the seed
    * groupBy already enumerates them and no separate node frame (or
    * members-distinct shuffle) is needed. The right entry point for
    * dedup survivor labeling, where the isolated majority is handled
    * by a final left join ([[Dedup.keepFrom]]), not by the iteration.
    */
  def fromPairs(pairs: DataFrame,
    checkpointDir: Option[String] = None): DataFrame = {
    val sym = symmetric(pairs).persist()
    val seed = sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("lbl"))
    val labels = propagate(sym, seed, checkpointDir)
    sym.unpersist()
    labels
  }

  private def symmetric(pairs: DataFrame): DataFrame =
    pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionAll(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))

  /** Min-label rounds to fixpoint. Each round is ONE job: the round
    * frame carries the previous label (`old`) alongside the new min,
    * and the changed-label count rides the materialization job as an
    * [[org.apache.spark.sql.Observation]] metric — no second
    * fixpoint-detection scan over the labels (which at 10^10 nodes is
    * a full pass per round saved).
    */
  private def propagate(sym: DataFrame, seed: DataFrame,
    checkpointDir: Option[String]): DataFrame = {
    var labels = Iterate.materialize(seed, checkpointDir)
    var done = false
    while (!done) {
      val viaEdges = labels.join(sym, labels("id") === sym("src"))
        .select(sym("dst").as("id"), labels("lbl").as("lbl"),
          lit(null).cast("long").as("old"))
      // every id keeps exactly one labels row, so min(old) recovers its
      // previous label; the union keeps that row a min() candidate, so
      // lbl <= old always and "changed" is a strict decrease. A null
      // old means the id reached via an edge had NO labels row at all
      // (caller passed a nodes frame missing a pair endpoint) — that id
      // just acquired its first label, which must count as changed or
      // the loop could stop a round early with unpropagated labels.
      val merged = labels.select(col("id"), col("lbl"), col("lbl").as("old"))
        .unionAll(viaEdges)
        .groupBy(col("id"))
        .agg(min(col("lbl")).as("lbl"), min(col("old")).as("old"))
      val obs = org.apache.spark.sql.Observation()
      val next = Iterate.materialize(
        merged.observe(obs,
          sum(when(col("old").isNull || col("lbl") < col("old"), 1L)
            .otherwise(0L)).as("changed"))
          .select(col("id"), col("lbl")), checkpointDir)
      labels = next
      done = obs.get("changed").asInstanceOf[Long] == 0L
    }
    labels
  }
}
