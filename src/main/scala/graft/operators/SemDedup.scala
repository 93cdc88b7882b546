package graft.operators

import graft.Tables
import graft.functions.NearestCentroids
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023):
  * cluster the embedding corpus into k cells, then inside each cell
  * apply the triangular rule — walk members in a fixed priority order
  * and drop any member whose cosine to ANY earlier member is ≥ τ.
  * [[Ann.nearDups]] answers "which pairs are near-identical" (LSH
  * blocking, recall < 1); this answers the coarser curation question
  * "which SEMANTIC redundancies can the corpus shed" — τ is lower
  * (paraphrases, templated rewrites), recall inside a cell is exact,
  * and the keep rule is the paper's: survivors are the CLUSTER-EDGE
  * exemplars (lowest cosine to centroid first), which SemDeDup found
  * preserves downstream accuracy better than keeping medoids.
  *
  * Reference hook: the vector store's raison d'être is embedding-level
  * content identity (Notion_openai_vector_etl.py:309-344 embeds
  * chunks; :345-368 upserts by hash identity) — this is the semantic
  * counterpart of that exact-hash dedup, over the same vectors.
  *
  * Scale shape (the published SemDeDup deployment shape — they ran
  * k = 50k clusters over LAION-440M): assignment is the shuffle-free
  * broadcast argmax ([[graft.functions.NearestCentroids]] — zero
  * exchange, same kernel as the IVF queries); the corpus then
  * shuffles ONCE on cent_id for the within-cell pair scan. With
  * k ≈ √n (the IVF convention) a cell holds O(√n) members, so
  * per-cell pairs stay O(n) total under uniform mass — and the pair
  * join runs through [[Skew.saltedSelfJoin]], so a viral cell (one
  * semantic template with millions of copies) lands on `salt`
  * reducers instead of one straggler. Production centroids come from
  * [[KMeansVec.fitRoutedBalanced]], which pins expected cell size to
  * n/k under corpus skew; the query below uses the deterministic
  * mod-sampled centroids shared with q_ann_ivf so the DuckDB oracle
  * can replay training-free.
  */
object SemDedup {

  /** Same near-dup bar as q_dedup_embed; SemDeDup's ε sweep lives in
    * [0.9, 0.95] for paraphrase-level pruning.
    */
  val Tau = 0.95

  /** Salt ways for the within-cell pair join. */
  val CellSalt = 8

  /** Semantic dedup of `vectors` (`(vec_id, embedding)`) against
    * centroid frame `cents` (`(cent_id, c_emb, c_nrm)`): returns one
    * row per vector, `(vec_id, cent_id, cent_cos, is_dup)` — `is_dup`
    * marks members shadowed by a priority-earlier neighbor at
    * cosine ≥ `tau`. Priority = cent_cos ASC, vec_id ASC (cluster
    * edge survives, the paper's keep rule); `cent_cos` is the
    * r6-rounded cosine the assignment kernel already computed, so the
    * order is engine-independent.
    */
  def dedup(vectors: DataFrame, cents: DataFrame, tau: Double = Tau,
    salt: Int = CellSalt): DataFrame = {
    val e = vectors.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Ann.norm(col("embedding")))
    val assigned = e
      .withColumn("nc", NearestCentroids.fromFrame(col("embedding"), cents, 1))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        element_at(col("nc"), 1).getField("cent_id").as("cent_id"),
        element_at(col("nc"), 1).getField("c_sim").as("cent_cos"))
      .persist()
    // Each unordered within-cell pair exactly once (a.vec_id < b.vec_id);
    // the shadowed member is the priority-LATER one: higher cent_cos,
    // ties by higher vec_id. With a.vec_id < b.vec_id enforced by the
    // join, "a is earlier" reduces to a.cent_cos <= b.cent_cos.
    val pairs = Skew.saltedSelfJoin(assigned, "vec_id", Seq("cent_id"), salt)
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        col("a.cent_cos").as("ca"), col("b.cent_cos").as("cb"),
        Ann.cosine(col("a.embedding"), col("a.nrm"),
          col("b.embedding"), col("b.nrm")).as("cos_ab"))
    val dropped = pairs.filter(col("cos_ab") >= tau)
      .select(when(col("ca") <= col("cb"), col("ib")).otherwise(col("ia"))
        .as("vec_id"))
      .distinct()
      .withColumn("hit", lit(true))
    val out = assigned.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cent_id"), col("cent_cos"),
        coalesce(col("hit"), lit(false)).as("is_dup"))
    assigned.unpersist()
    out
  }

  /** q_semdedup — [[dedup]] over the dup-injected corpus
    * ([[Tables.embAug]]) with the deterministic mod-25 centroids taken
    * from the BASE table (so augmented copies never become centroids).
    */
  def semdedup(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Ann.norm(col("embedding")))
    val cents = base.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    dedup(Tables.embAug(s, d), cents).orderBy(col("vec_id"))
  }

  val semdedupSql: String = {
    import Ann.{cosineSql, dotSql}
    val nrm = s"sqrt(${dotSql("embedding", "embedding")})"
    s"""WITH ${Tables.embAugSql},
       |e AS (
       |  SELECT vec_id, embedding, $nrm AS nrm FROM emb_aug
       |), cents AS (
       |  SELECT vec_id AS cent_id, embedding AS c_emb, $nrm AS c_nrm
       |  FROM embeddings WHERE vec_id % 25 = 0
       |), assigned AS (
       |  SELECT vec_id, embedding, nrm, cent_id, c_cos FROM (
       |    SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
       |           ${cosineSql("e.embedding", "e.nrm", "c.c_emb", "c.c_nrm")} AS c_cos,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             ${cosineSql("e.embedding", "e.nrm", "c.c_emb", "c.c_nrm")} DESC,
       |             c.cent_id) AS rk
       |    FROM e CROSS JOIN cents c)
       |  WHERE rk = 1
       |), pairs AS (
       |  SELECT x.vec_id AS ia, y.vec_id AS ib, x.c_cos AS ca, y.c_cos AS cb,
       |         ${cosineSql("x.embedding", "x.nrm", "y.embedding", "y.nrm")} AS cos_ab
       |  FROM assigned x JOIN assigned y
       |    ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
       |), dropped AS (
       |  SELECT DISTINCT CASE WHEN ca <= cb THEN ib ELSE ia END AS vec_id
       |  FROM pairs WHERE cos_ab >= $Tau
       |)
       |SELECT a.vec_id, a.cent_id, a.c_cos AS cent_cos,
       |       (d.vec_id IS NOT NULL) AS is_dup
       |FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
       |ORDER BY a.vec_id""".stripMargin
  }
}
