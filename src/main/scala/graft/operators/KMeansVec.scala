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
}
