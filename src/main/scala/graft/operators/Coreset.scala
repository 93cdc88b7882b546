package graft.operators

import graft.Tables
import graft.functions.{NearestCentroids, TextSim}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
  * traversal): pick the corpus member farthest (min cosine similarity
  * to every already-picked center) each round — a 2-approximation of
  * the optimal k-center cover, and the standard recipe for a DIVERSE
  * audit/labeling slice of an embedding corpus ([[Corpus.auditSample]]
  * is the uniform slice; this is the coverage slice: every corpus
  * point ends up within the last-round radius of some center, so the
  * k picks "span" the embedding space). The final round's distance is
  * the corpus covering radius — the one-number summary of how spread
  * the corpus is at budget k.
  *
  * Scale shape: each round is ONE corpus scan — the running center set
  * is a bounded k×d literal riding the scan through the
  * [[NearestCentroids]] codegen kernel (zero shuffle), and the
  * farthest point is a 1-row `max(struct(d, -vec_id))` argmax — never
  * a sort. k rounds = k scans (farthest-point traversal is inherently
  * sequential in k); for large k keep a persisted per-row running
  * min-distance frame instead (one narrow update join per round) —
  * at audit-slice k (≤ a few dozen) the stateless rescan is cheaper
  * than maintaining corpus-sized state.
  *
  * Determinism: similarities are r6-rounded before any comparison
  * (the [[Ann]] rule), ties break to the smallest vec_id, the seed is
  * the smallest id — bit-reproducible on any engine/partitioning,
  * DuckDB-hash-verified via an unrolled CTE chain carrying the same
  * running least().
  */
object Coreset {

  val K = 6

  /** Greedy k-center rounds over `(vec_id, embedding)`: returns the
    * bounded k-row pick list (round, vec_id, d_min) where d_min is
    * the pick's cosine distance to the previously-picked set (0 for
    * the seed).
    */
  def kCenters(emb: DataFrame, k: Int = K): DataFrame = {
    val s = emb.sparkSession
    val base = emb.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Ann.norm(col("embedding")))
      .persist()
    try {
      val seed = base.orderBy(col("vec_id")).limit(1)
        .select(col("vec_id"), col("embedding"), col("nrm")).collect().head
      var ids = Array(seed.getLong(0))
      var vecs = Array(seed.getSeq[Float](1).toArray)
      var nrms = Array(seed.getDouble(2))
      val picks = scala.collection.mutable.ArrayBuffer(
        (1L, seed.getLong(0), 0.0))
      var round = 2
      while (round <= k) {
        // top-1 similarity to the current center set, per row; the
        // farthest point maximizes (1 - sim), ties to smallest id
        val scored = base.select(col("vec_id"), col("embedding"), col("nrm"),
          (lit(1.0) - element_at(
            NearestCentroids(col("embedding"), ids, vecs, nrms, 1), 1)
            .getField("c_sim")).as("d"))
        val best = scored
          .agg(max(struct(col("d").as("d"), (-col("vec_id")).as("nid"))).as("b"))
          .select(col("b.d"), (-col("b.nid")).as("vec_id")).collect().head
        val pick = base.filter(col("vec_id") === best.getLong(1))
          .select(col("embedding"), col("nrm")).collect().head
        ids :+= best.getLong(1)
        vecs :+= pick.getSeq[Float](0).toArray
        nrms :+= pick.getDouble(1)
        picks += ((round.toLong, best.getLong(1), best.getDouble(0)))
        round += 1
      }
      val schema = StructType(Seq(
        StructField("round", LongType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("d_min", DoubleType, nullable = false)))
      s.createDataFrame(
        s.sparkContext.parallelize(picks.toSeq.map(p => Row(p._1, p._2, p._3)), 1),
        schema)
    } finally base.unpersist()
  }

  /** q_coreset — the K=6 farthest-point audit slice of the embedding
    * corpus, with each pick's distance-at-selection (the last row's
    * d_min is the covering radius at budget K).
    */
  def coreset(s: SparkSession, d: String): DataFrame =
    kCenters(Tables.embeddings(s, d), K)

  val coresetSql: String = {
    def cos(c: String) = Ann.cosineSql("e.embedding", "e.nrm", s"$c.embedding", s"$c.nrm")
    val rounds = (2 to K).map { i =>
      // mi: running min distance to centers {1..i-1}; ci: this round's
      // pick. d = 1 − r6(cos) — r6 on the COSINE exactly like the
      // kernel side (r6(1−cos) would round a different double).
      val mDef = if (i == 2)
        s"""m2 AS (
           |  SELECT e.vec_id, (1 - ${cos("c1e")})::DOUBLE AS d
           |  FROM e CROSS JOIN c1e
           |)"""
      else
        s"""m$i AS (
           |  SELECT m.vec_id,
           |         least(m.d, (1 - ${cos(s"c${i - 1}e")})::DOUBLE) AS d
           |  FROM m${i - 1} m JOIN e ON e.vec_id = m.vec_id CROSS JOIN c${i - 1}e
           |)"""
      val cDef =
        s"""c$i AS (
           |  SELECT vec_id, d FROM m$i ORDER BY d DESC, vec_id ASC LIMIT 1
           |), c${i}e AS (
           |  SELECT e.* FROM e JOIN c$i USING (vec_id)
           |)"""
      s"$mDef,\n$cDef"
    }.mkString(",\n")
    val picks = (2 to K).map(i =>
      s"SELECT $i::BIGINT AS round, vec_id::BIGINT AS vec_id, d AS d_min FROM c$i")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${Ann.dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings
       |), c1 AS (
       |  SELECT min(vec_id) AS vec_id FROM e
       |), c1e AS (
       |  SELECT e.* FROM e JOIN c1 USING (vec_id)
       |),
       |$rounds
       |SELECT * FROM (
       |  SELECT 1::BIGINT AS round,
       |         (SELECT vec_id FROM c1)::BIGINT AS vec_id, 0.0::DOUBLE AS d_min
       |  UNION ALL
       |  $picks
       |)
       |ORDER BY round""".stripMargin
  }
}
