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
    // init = the k lowest vec_ids with ranks 1..k. The ids come back
    // via TakeOrdered (partial top-k per partition, never a full
    // sort) and the k-row rank map is built driver-side and broadcast
    // back — a k-long bounded-statistic collect, replacing the
    // unpartitioned row_number window (the r5 test-log-noise source:
    // a corpus-shaped construct for a k-row job)
    val spark = vectors.sparkSession
    val initIds = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    val idMap = spark.createDataFrame(
      initIds.toIndexedSeq.zipWithIndex.map { case (v, i) => (v, (i + 1).toLong) })
      .toDF("vec_id", "cent_id")
    var cents = Iterate.materialize(
      e.join(broadcast(idMap), "vec_id")
        .select(col("cent_id"), col("embedding").as("c_emb"),
          col("nrm").as("c_nrm")), checkpointDir)
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
    val init = Iterate.materialize(
      routed.withColumn("rn", row_number().over(wInit).cast("long"))
        .filter(col("rn") <= kSub)
        .select(((col("top_id") - 1) * kSub + col("rn")).as("cent_id"),
          col("embedding").as("c_emb"), col("nrm").as("c_nrm")),
      checkpointDir)
    val leaves = lloydLeaves(routed, init, kTop, kSub, iters, checkpointDir)
    routed.unpersist(); e.unpersist()
    (top, leaves)
  }

  /** BALANCE-AWARE two-level quantizer: [[fitRouted]] with the leaf
    * budget allocated to top cells IN PROPORTION TO THEIR MASS instead
    * of uniformly. Uniform kSub assumes top cells are near-equal; a
    * skewed corpus (one dominant domain/language/near-dup family)
    * concentrates most rows in a few hot cells, whose lists then grow
    * toward mass/kSub while cold cells waste leaves on a handful of
    * rows. Allocating `k_c ≈ leafBudget·mass_c/n` (clamped to
    * [1, kSubMax] and to the cell's row count) pins every cell's
    * EXPECTED list size near n/leafBudget regardless of skew — the
    * per-cell count is a data statistic, so allocation is one kTop-row
    * aggregate collected driver-side (the same k-sized collect the
    * centroid broadcast already does).
    *
    * Leaf ids stay on the `(top_id−1)·kSubMax + rank` grid, so the
    * top cell of any leaf remains arithmetic and every downstream
    * consumer ([[graft.functions.RoutedNearest]] grouping, IndexStore
    * list layout, append/search routing) works unchanged with
    * `kSub = kSubMax`; cells simply own ≤ kSubMax live leaves. Returns
    * (topCents, leafCents).
    */
  def fitRoutedBalanced(vectors: DataFrame, kTop: Int, kSubMax: Int,
    leafBudget: Int, iters: Int,
    checkpointDir: Option[String] = None): (DataFrame, DataFrame) = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val e = withNorm(vectors.select(col("vec_id"), col("embedding")))
      .persist()
    val top = fit(vectors, kTop, iters, checkpointDir)
    val routed = assign(e, top)
      .select(col("cent_id").as("top_id"), col("vec_id"),
        col("embedding"), col("nrm"))
      .persist()
    val cnts = routed.groupBy(col("top_id")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val alloc = allocateLeaves(cnts, kSubMax, leafBudget)
    val allocDf = broadcast(alloc.toSeq.toDF("top_id", "k_c"))
    val wInit = Window.partitionBy(col("top_id")).orderBy(col("vec_id"))
    val init = Iterate.materialize(
      routed.join(allocDf, "top_id")
        .withColumn("rn", row_number().over(wInit).cast("long"))
        .filter(col("rn") <= col("k_c"))
        .select(((col("top_id") - 1) * kSubMax + col("rn")).as("cent_id"),
          col("embedding").as("c_emb"), col("nrm").as("c_nrm")),
      checkpointDir)
    val leaves = lloydLeaves(routed, init, kTop, kSubMax, iters, checkpointDir)
    routed.unpersist(); e.unpersist()
    (top, leaves)
  }

  /** Capped highest-averages leaf allocation: every live cell starts
    * at one leaf, then each remaining unit of budget goes to the cell
    * with the highest mass-per-leaf-so-far among cells still under
    * their cap (min(kSubMax, cell rows)) — the greedy that directly
    * minimizes the worst expected list size, and unlike one-shot
    * proportional rounding it RE-SPENDS budget a capped hot cell
    * can't absorb instead of stranding it. Driver-side over ≤ kTop
    * cells (the same k-sized statistic the centroid broadcast ships).
    */
  private[graft] def allocateLeaves(cellMass: Array[(Long, Long)],
    kSubMax: Int, leafBudget: Int): Array[(Long, Long)] = {
    val cap = cellMass.map { case (id, c) =>
      id -> math.max(1L, math.min(kSubMax.toLong, c))
    }.toMap
    val alloc = scala.collection.mutable.Map(cellMass.map(_._1 -> 1L): _*)
    val mass = cellMass.toMap
    var left = leafBudget - cellMass.length
    val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
      Ordering.by(x => (x._1, -x._2))) // mass/leaf desc, low id tie-break
    cellMass.foreach { case (id, c) =>
      if (alloc(id) < cap(id)) pq.enqueue((c / 2.0, id))
    }
    while (left > 0 && pq.nonEmpty) {
      val (_, id) = pq.dequeue()
      alloc(id) += 1
      left -= 1
      if (alloc(id) < cap(id))
        pq.enqueue((mass(id).toDouble / (alloc(id) + 1), id))
    }
    alloc.toArray.sortBy(_._1)
  }

  /** The grouped Lloyd pass shared by [[fitRouted]] and
    * [[fitRoutedBalanced]]: every cell's leaves recenter
    * simultaneously — assignment is the broadcast-backed routed argmax
    * (each row considers only its own top cell's leaves on the `grid`
    * layout), recentering is one leaf-id groupBy — so the whole
    * sub-level trains in `iters` jobs, not kTop·iters.
    */
  private def lloydLeaves(routed: DataFrame, init: DataFrame, kTop: Int,
    grid: Int, iters: Int, checkpointDir: Option[String]): DataFrame = {
    var leaves = init
    for (_ <- 1 to iters) {
      val bc = graft.functions.RoutedNearest.broadcastFrom(leaves, kTop, grid)
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
    leaves
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
