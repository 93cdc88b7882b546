package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Signed random projection (Johnson–Lindenstrauss / Achlioptas ±1
  * family) — the dimensionality-reduction step a 100 TB embedding
  * pipeline runs BEFORE the quadratic-ish stages: hyperplane LSH,
  * k-means routing, and pair verification all cost O(dim) per
  * comparison, and a 64→8 projection cuts that 8× while JL keeps
  * relative distances within (1±ε) w.h.p. The reference embeds at a
  * fixed provider dimension (Notion_openai_vector_etl.py:329-344,
  * text-embedding-3 vectors) and has no reduction step; at corpus
  * scale one is mandatory.
  *
  * Determinism (the oracle contract): the ±1 sign matrix is NOT
  * random state — entry (i, j) is the parity of the first hex nibble
  * of md5("rp:i:j"), so Spark (driver-side literal matrix) and the
  * DuckDB oracle (inline md5) derive bit-identical signs with no
  * shipped artifact. Components are fixed to integer micro units
  * first ([[Pool]]'s rule), so each projection is a LONG dot product
  * — order-independent, hash-oracle-safe.
  *
  * Scale shape: pure per-row map over the scan — the sign matrix
  * rides the plan as a dim×D literal (zip_with + aggregate, all
  * codegen), no shuffle, no join, no driver state beyond one
  * 1-row dim probe. The SQL mirror pays a |rows|×D cross join +
  * re-aggregation because SQL lacks the array fold; the Spark plan
  * does NOT re-shuffle what was already per-row.
  */
object RandProj {

  /** Output dimensionality of the reduced space. */
  val D = 8

  /** ±1 sign for matrix entry (i, j): parity of the first hex nibble
    * of md5("rp:i:j") — the exact value DuckDB's
    * `('0x' || substr(md5('rp:' || i || ':' || j), 1, 1))::BIGINT % 2`
    * sees.
    */
  private[graft] def sign(i: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val b0 = md.digest(s"rp:$i:$j".getBytes("UTF-8"))(0)
    if (((b0 >> 4) & 0xF) % 2 == 0) 1L else -1L
  }

  /** Micro-fixed embedding column: floor(v·1e6 + 0.5) per component. */
  private def microVec(emb: Column): Column =
    transform(emb, v => floor(v.cast("double") * 1e6 + 0.5).cast("long"))

  /** The D projection columns over a `vm` micro-vector column, signs
    * baked in as a dim×D literal. `dim` is probed from the first row
    * (a bounded 1-row driver action; the corpus dim is a schema-level
    * constant); an EMPTY frame short-circuits to None so callers
    * return empty output instead of crashing on the probe.
    */
  private def projArray(vectors: DataFrame): Option[Column] = {
    val first = vectors.select(size(col("embedding")).as("d")).head(1)
    if (first.isEmpty) return None
    val dim = first(0).getInt(0)
    Some(array((0 until D).map { j =>
      val signs = typedLit((0 until dim).map(i => sign(i, j)).toArray)
      aggregate(zip_with(col("vm"), signs, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
    }: _*))
  }

  /** `(vec_id, j, proj_micro)` — the flat oracle-comparable form:
    * projection j of each vector in micro units.
    */
  def projectFlat(vectors: DataFrame): DataFrame = projArray(vectors) match {
    case None =>
      vectors.select(col("vec_id"), lit(0L).as("j"), lit(0L).as("proj_micro"))
        .limit(0)
    case Some(projs) =>
      vectors
        .select(col("vec_id"), microVec(col("embedding")).as("vm"))
        .select(col("vec_id"), posexplode(projs).as(Seq("j", "proj_micro")))
        .select(col("vec_id"), col("j").cast("long").as("j"), col("proj_micro"))
  }

  /** The library face: `(vec_id, embedding)` in the reduced D-dim
    * space (micro units scaled back to floats) — drop-in input for
    * [[Ann.topKNeighbors]] blocking, [[KMeansVec]] routing, or
    * [[SemDedup]] clustering at 1/8 the per-comparison cost. Built
    * per-row from the same projection array as [[projectFlat]] — no
    * explode, no shuffle, no reassembly (the module's no-shuffle
    * claim holds for the library face too).
    */
  def projectedVectors(vectors: DataFrame): DataFrame = projArray(vectors) match {
    case None =>
      vectors.select(col("vec_id"),
        array().cast("array<float>").as("embedding")).limit(0)
    case Some(projs) =>
      vectors
        .select(col("vec_id"), microVec(col("embedding")).as("vm"))
        .select(col("vec_id"),
          transform(projs, p => (p.cast("double") / 1e6).cast("float"))
            .as("embedding"))
  }

  /** q_rand_proj — [[projectFlat]] over the embeddings table. */
  def randProj(s: SparkSession, d: String): DataFrame =
    projectFlat(Tables.embeddings(s, d)).orderBy(col("vec_id"), col("j"))

  val randProjSql: String =
    s"""WITH ex AS (
       |  SELECT vec_id, unnest(range(1, len(embedding) + 1)) - 1 AS i,
       |         unnest(embedding) AS v
       |  FROM embeddings
       |), micro AS (
       |  SELECT vec_id, i, floor(v::DOUBLE * 1000000.0 + 0.5)::BIGINT AS vm
       |  FROM ex
       |)
       |SELECT m.vec_id, js.j,
       |       sum(m.vm * (CASE WHEN ('0x' || substr(md5('rp:' || m.i || ':' || js.j), 1, 1))::BIGINT % 2 = 0
       |                        THEN 1 ELSE -1 END))::BIGINT AS proj_micro
       |FROM micro m, (SELECT unnest(range(0, $D)) AS j) js
       |GROUP BY m.vec_id, js.j
       |ORDER BY vec_id, j""".stripMargin
}
