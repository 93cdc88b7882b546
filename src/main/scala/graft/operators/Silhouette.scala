package graft.operators

import graft.Tables
import graft.functions.{NearestCentroids, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Simplified silhouette cluster-quality audit (Hruschka et al.'s
  * centroid form of Rousseeuw 1987): per vector, cohesion a = cosine
  * distance to its OWN centroid, separation b = distance to the
  * nearest OTHER centroid, s = (b−a)/max(a,b) ∈ [0,1] here (b ≥ a by
  * argmax). The quality gate for every centroid consumer the engine
  * has — a low-silhouette list in the IVF index ([[Ann.ivfSearch]])
  * is a region where nprobe must grow to hold recall, a low mean in
  * `q_cluster_mix`'s regions says the mix report is slicing noise,
  * and the per-cluster report says WHICH clusters to re-train or
  * merge (the [[graft.sources.IndexStore]] maintain decision wants
  * exactly this signal).
  *
  * Determinism: both similarities come r6-ROUNDED from the
  * [[NearestCentroids]] kernel (bit-parity with the oracle's
  * rank-by-rounded-cosine), so s = (sim1−sim2)/(1−sim2) sees
  * identical doubles on both engines; each per-vector s then fixes to
  * integer MICRO units before the group sum (the exact-mean rule —
  * a double Σ folds in partition order) and the mean divides once,
  * r6. A vector exactly ON its centroid's ray with sim2 = 1 too
  * (a = b = 0) scores s = 0 by convention — the guard branch.
  *
  * Scale shape: assignment + runner-up in ONE pass of the broadcast
  * argmax kernel (zero shuffle, no |V|×nlist frame ever exists);
  * one partial-agg groupBy to ≤ nlist rows. The corpus is scanned
  * once and never shuffled by vector id.
  */
object Silhouette {

  /** Per-cluster simplified silhouette over `(vec_id, embedding)`
    * against a `(cent_id, c_emb, c_nrm)` centroid frame:
    * `(cent_id, n_vecs, mean_sim, mean_sil, min_sil)`.
    */
  def silhouette(vectors: DataFrame, cents: DataFrame): DataFrame = {
    val nc = vectors
      .withColumn("nc", NearestCentroids.fromFrame(col("embedding"), cents, 2))
      .select(
        element_at(col("nc"), 1).getField("cent_id").as("cent_id"),
        element_at(col("nc"), 1).getField("c_sim").as("sim1"),
        element_at(col("nc"), 2).getField("c_sim").as("sim2"))
    val s = when(col("sim2") < 1.0d,
      (col("sim1") - col("sim2")) / (lit(1.0d) - col("sim2")))
      .otherwise(lit(0.0d))
    nc
      .select(col("cent_id"),
        floor(col("sim1") * 1e6 + 0.5).cast("long").as("sim_micro"),
        floor(s * 1e6 + 0.5).cast("long").as("sil_micro"))
      .groupBy(col("cent_id"))
      .agg(count(lit(1)).cast("long").as("n_vecs"),
        sum(col("sim_micro")).as("ssim"),
        sum(col("sil_micro")).as("ssil"),
        min(col("sil_micro")).as("msil"))
      .select(col("cent_id"), col("n_vecs"),
        TextSim.r6(col("ssim").cast("double") /
          (col("n_vecs").cast("double") * 1e6)).as("mean_sim"),
        TextSim.r6(col("ssil").cast("double") /
          (col("n_vecs").cast("double") * 1e6)).as("mean_sil"),
        TextSim.r6(col("msil").cast("double") / 1e6).as("min_sil"))
  }

  /** q_silhouette — [[silhouette]] over the embeddings corpus with
    * the deterministic mod-25 centroid fixture shared with
    * q_ann_ivf / q_cluster_mix.
    */
  def silhouetteQuery(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Ann.norm(col("embedding")))
    val cents = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    silhouette(e.select(col("vec_id"), col("embedding")), cents)
      .orderBy(col("cent_id"))
  }

  val silhouetteSql: String = {
    import Ann.cosineSql
    val nrm = s"sqrt(${Ann.dotSql("embedding", "embedding")})"
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $nrm AS nrm FROM embeddings
       |), cents AS (
       |  SELECT vec_id AS cent_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM e WHERE vec_id % 25 = 0
       |), ranked AS (
       |  SELECT e.vec_id, c.cent_id,
       |         ${TextSim.r6Sql(cosineSql("e.embedding", "e.nrm", "c.c_emb", "c.c_nrm"))} AS sim,
       |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |           ${TextSim.r6Sql(cosineSql("e.embedding", "e.nrm", "c.c_emb", "c.c_nrm"))} DESC,
       |           c.cent_id) AS rk
       |  FROM e CROSS JOIN cents c
       |), pairs AS (
       |  SELECT r1.vec_id, r1.cent_id, r1.sim AS sim1, r2.sim AS sim2
       |  FROM ranked r1 JOIN ranked r2 ON r1.vec_id = r2.vec_id
       |  WHERE r1.rk = 1 AND r2.rk = 2
       |), micro AS (
       |  SELECT cent_id,
       |         floor(sim1 * 1000000.0 + 0.5)::BIGINT AS sim_micro,
       |         floor((CASE WHEN sim2 < 1.0
       |                     THEN (sim1 - sim2) / (1.0 - sim2)
       |                     ELSE 0.0 END) * 1000000.0 + 0.5)::BIGINT AS sil_micro
       |  FROM pairs
       |)
       |SELECT cent_id, count(*)::BIGINT AS n_vecs,
       |       ${TextSim.r6Sql("sum(sim_micro)::DOUBLE / (count(*)::DOUBLE * 1000000.0)")} AS mean_sim,
       |       ${TextSim.r6Sql("sum(sil_micro)::DOUBLE / (count(*)::DOUBLE * 1000000.0)")} AS mean_sil,
       |       ${TextSim.r6Sql("min(sil_micro)::DOUBLE / 1000000.0")} AS min_sil
       |FROM micro
       |GROUP BY cent_id
       |ORDER BY cent_id""".stripMargin
  }
}
