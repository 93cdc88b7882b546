package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an `embedding: array<float>`
  * column — trains the coarse quantizer for [[Ann.ivfTrained]]
  * (replacing the fixed modulo-sampled centroids of [[Ann.ivf]]).
  *
  * Iteration shape at scale: assignment ships k centroids to the tasks
  * and makes one shuffle-free pass over the vectors ([[assign]]); the
  * re-centering groupBy shuffles (cent_id, dim) pairs — k·dim groups,
  * partial-aggregated map-side. Each round's centroids are
  * materialized ([[Iterate.materialize]]): k rows, cuts the iterative
  * lineage exactly like [[Crawl.bfs]] does for its frontier.
  *
  * Determinism: init = the k lowest vec_ids; ties in assignment break
  * on lowest cent_id; means are exact double sums in dim order.
  */
object KMeansVec {

  /** Cosine-based assignment of each vector to its nearest centroid —
    * a per-row [[graft.functions.NearestCentroids]] argmax with the
    * centroid matrix shipped as a task reference object: zero shuffle,
    * zero sort (the crossJoin+Window form this replaces exchanged
    * |V|×k rows per Lloyd round to compute a per-row reduction).
    */
  def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.withColumn("nc",
      graft.functions.NearestCentroids.fromFrame(col("embedding"), cents, 1))
      .select(element_at(col("nc"), 1).getField("cent_id").as("cent_id"),
        col("vec_id"), col("embedding"), col("nrm"))

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", Ann.norm(col("embedding")))

  /** `iters` Lloyd rounds from a deterministic init; returns
    * (cent_id, c_emb, c_nrm). `checkpointDir` selects reliable
    * `checkpoint` over `localCheckpoint` for the per-round centroid
    * materialization ([[Iterate.materialize]]).
    */
  def fit(vectors: DataFrame, k: Int, iters: Int,
    checkpointDir: Option[String] = None): DataFrame = {
    val e = withNorm(vectors.select(col("vec_id"), col("embedding")))
      .persist()
    val wInit = Window.orderBy(col("vec_id"))
    var cents = Iterate.materialize(e.orderBy(col("vec_id")).limit(k)
      .select(row_number().over(wInit).cast("long").as("cent_id"),
        col("embedding").as("c_emb"), col("nrm").as("c_nrm")), checkpointDir)
    for (_ <- 1 to iters) {
      val centered = assign(e, cents)
        .select(col("cent_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cent_id"), col("dim"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s("m").cast("float")).as("c_emb"))
      cents = Iterate.materialize(
        withNorm(centered.withColumnRenamed("c_emb", "embedding"))
          .select(col("cent_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm")),
        checkpointDir)
    }
    e.unpersist()
    cents
  }

  /** Two-level ROUTED coarse quantizer: [[fit]] trains `kTop` top
    * cells, then one GROUPED Lloyd pass trains `kSub` leaves inside
    * every cell simultaneously — assignment is the
    * [[graft.functions.RoutedNearest]] per-row argmax restricted to
    * the row's own top cell (kSub dots, broadcast leaf matrix),
    * recentering is the same leaf-id groupBy [[fit]] uses — so the
    * whole sub-level trains in `iters` jobs, not kTop·iters. Leaf ids
    * are `(top_id−1)·kSub + rank` (1-based both levels): the top cell
    * of any leaf is arithmetic, never a lookup table. Returns
    * (topCents, leafCents), both `(cent_id, c_emb, c_nrm)`.
    *
    * Why routing at all: flat assignment does nlist dot products per
    * row with the centroid matrix serialized into every task; past a
    * few thousand lists both stop scaling. Routed assignment is
    * kTop + kSub dots per row, and the leaf matrix rides a real
    * `Broadcast` (once per executor).
    */
  def fitRouted(vectors: DataFrame, kTop: Int, kSub: Int, iters: Int,
    checkpointDir: Option[String] = None): (DataFrame, DataFrame) = {
    val e = withNorm(vectors.select(col("vec_id"), col("embedding")))
      .persist()
    val top = fit(vectors, kTop, iters, checkpointDir)
    val routed = assign(e, top)
      .select(col("cent_id").as("top_id"), col("vec_id"),
        col("embedding"), col("nrm"))
      .persist()
    // init: the kSub lowest vec_ids OF EACH CELL (fit's init rule,
    // applied per group)
    val wInit = Window.partitionBy(col("top_id")).orderBy(col("vec_id"))
    var leaves = Iterate.materialize(
      routed.withColumn("rn", row_number().over(wInit).cast("long"))
        .filter(col("rn") <= kSub)
        .select(((col("top_id") - 1) * kSub + col("rn")).as("cent_id"),
          col("embedding").as("c_emb"), col("nrm").as("c_nrm")),
      checkpointDir)
    for (_ <- 1 to iters) {
      val bc = graft.functions.RoutedNearest.broadcastFrom(leaves, kTop, kSub)
      val centered = assignRouted(routed, bc)
        .select(col("cent_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cent_id"), col("dim"))
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy(col("cent_id"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s("m").cast("float")).as("c_emb"))
      leaves = Iterate.materialize(
        withNorm(centered.withColumnRenamed("c_emb", "embedding"))
          .select(col("cent_id"), col("embedding").as("c_emb"),
            col("nrm").as("c_nrm")),
        checkpointDir)
      bc.unpersist(blocking = false)
    }
    routed.unpersist(); e.unpersist()
    (top, leaves)
  }

  /** Nearest-leaf assignment of rows already routed to a `top_id`:
    * `(cent_id, vec_id, embedding, nrm)` like [[assign]], with the
    * grouped leaf matrix as a broadcast.
    */
  def assignRouted(routed: DataFrame,
    bc: org.apache.spark.broadcast.Broadcast[graft.functions.RoutedCents]):
      DataFrame =
    routed.withColumn("nc", graft.functions.RoutedNearest(
      array(col("top_id")), col("embedding"), bc, 1))
      .select(element_at(col("nc"), 1).getField("cent_id").as("cent_id"),
        col("vec_id"), col("embedding"), col("nrm"))
}
