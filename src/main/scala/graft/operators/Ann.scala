package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (`array<float>`, dim 64).
  *
  * Cosine is computed in double with identical element order on both
  * engines (cast-to-double products folded left-to-right), and every
  * ranking orders by the *rounded* score with vec_id tiebreak, so the
  * DuckDB oracle ranks identically bit-for-bit.
  *
  * Scale: brute-force broadcasts the (small) query set and makes one
  * pass over the vectors — correctness baseline and the right answer
  * when |Q| is small. IVF is the 100 TB path: vectors are
  * partition-assigned to coarse centroids once (broadcast join), a
  * query probes nprobe centroid partitions and scans only those.
  */
object Ann {

  val Dim = 64
  val TopK = 10
  val NProbe = 2
  val Planes = 12
  val PlaneBands = 4 // 3 planes per band

  /** Double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** round-6 cosine — the only form ever compared or ranked on. */
  def cosine(a: Column, na: Column, b: Column, nb: Column): Column =
    round(dot(a, b) / (na * nb), 6)

  def dotSql(a: String, b: String): String =
    s"list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE for i in range(1, ${Dim + 1})])"

  def cosineSql(a: String, na: String, b: String, nb: String): String =
    s"round(${dotSql(a, b)} / ($na * $nb), 6)"

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", norm(col("embedding")))

  private val normSql =
    s"sqrt(${dotSql("embedding", "embedding")})"

  /** q_ann_brute — exact top-k cosine neighbours for each query vector
    * (query set: vec_id % 100 = 0), self excluded.
    */
  def bruteForce(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val q = e.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("q_nrm"), col("embedding"), col("nrm")).as(
          "cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val bruteForceSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $normSql AS nrm FROM embeddings
       |), q AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm
       |  FROM e WHERE vec_id % 100 = 0
       |), scored AS (
       |  SELECT q.query_id, e.vec_id,
       |         ${cosineSql("q.q_emb", "q.q_nrm", "e.embedding", "e.nrm")} AS cos_sim
       |  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
       |), ranked AS (
       |  SELECT query_id, vec_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, vec_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank::BIGINT AS rank, vec_id, cos_sim
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** q_ann_ivf — IVF-style ANN: deterministic coarse centroids
    * (vec_id % 25 = 0), nearest-centroid assignment (broadcast join —
    * this is the partitioning that makes 100 TB tractable), nprobe=2
    * probing, exact top-k within the probed lists.
    */
  def ivf(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val cents = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))

    def nearest(df: DataFrame, keyCol: String, n: Int): DataFrame = {
      val w = Window.partitionBy(col(keyCol))
        .orderBy(col("c_sim").desc, col("cent_id"))
      df.crossJoin(broadcast(cents))
        .withColumn("c_sim", cosine(col("embedding"), col("nrm"), col("c_emb"), col("c_nrm")))
        .withColumn("c_rank", row_number().over(w))
        .filter(col("c_rank") <= n)
    }

    val assigned = nearest(e, "vec_id", 1)
      .select(col("cent_id"), col("vec_id"), col("embedding"), col("nrm"))
    val q = e.filter(col("vec_id") % 100 === 0)
    val probes = nearest(q, "vec_id", NProbe)
      .select(col("vec_id").as("query_id"), col("cent_id"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = probes.join(assigned, "cent_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("q_nrm"), col("embedding"), col("nrm")).as("cos_sim"))
      .distinct() // a vector may appear via both probed lists
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val ivfSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $normSql AS nrm FROM embeddings
       |), cents AS (
       |  SELECT vec_id AS cent_id, embedding AS c_emb, nrm AS c_nrm
       |  FROM e WHERE vec_id % 25 = 0
       |), assigned AS (
       |  SELECT cent_id, vec_id, embedding, nrm FROM (
       |    SELECT c.cent_id, e.vec_id, e.embedding, e.nrm,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             ${cosineSql("e.embedding", "e.nrm", "c.c_emb", "c.c_nrm")} DESC,
       |             c.cent_id) AS c_rank
       |    FROM e CROSS JOIN cents c)
       |  WHERE c_rank = 1
       |), probes AS (
       |  SELECT query_id, cent_id, q_emb, q_nrm FROM (
       |    SELECT q.vec_id AS query_id, c.cent_id,
       |           q.embedding AS q_emb, q.nrm AS q_nrm,
       |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |             ${cosineSql("q.embedding", "q.nrm", "c.c_emb", "c.c_nrm")} DESC,
       |             c.cent_id) AS c_rank
       |    FROM e q CROSS JOIN cents c WHERE q.vec_id % 100 = 0)
       |  WHERE c_rank <= $NProbe
       |), scored AS (
       |  SELECT DISTINCT p.query_id, a.vec_id,
       |         ${cosineSql("p.q_emb", "p.q_nrm", "a.embedding", "a.nrm")} AS cos_sim
       |  FROM probes p JOIN assigned a ON a.cent_id = p.cent_id
       |  WHERE a.vec_id <> p.query_id
       |), ranked AS (
       |  SELECT query_id, vec_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, vec_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank::BIGINT AS rank, vec_id, cos_sim
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** Deterministic ±1 hyperplane coefficient for (plane p, dim i):
    * LCG-derived sign — pure integer arithmetic, identical inline
    * expression in both engines (no literal matrix to ship).
    */
  private def coef(p: Column, i: Column): Column =
    when(((lit(1103515245L) * (p * Dim + i + 1) + 12345L) % 2147483648L)
      .bitwiseAND(lit(65536L)) === 0, lit(1.0)).otherwise(lit(-1.0))

  private def coefSql(p: String, i: String): String =
    s"(CASE WHEN ((1103515245 * ($p * $Dim + $i + 1) + 12345) % 2147483648) & 65536 = 0 THEN 1.0 ELSE -1.0 END)"

  /** q_dedup_embed — near-duplicate vectors (cosine ≥ 0.95) via
    * random-hyperplane LSH blocking on the dup-injected corpus:
    * 12 sign bits → 4 bands × 3 bits → band-bucket self-join → exact
    * cosine verify on candidates only.
    */
  def embedDedup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embAug(s, d)
      .withColumn("nrm", norm(col("embedding")))
    val bits = transform(sequence(lit(0), lit(Planes - 1)), p => {
      val proj = aggregate(sequence(lit(0), lit(Dim - 1)), lit(0.0), (a, i) =>
        a + element_at(col("embedding"), i + 1).cast("double") * coef(p, i))
      when(proj >= 0, lit(1L)).otherwise(lit(0L))
    })
    val withBits = e.withColumn("bits", bits)
    val bandCols = (0 until PlaneBands).map { b =>
      struct(lit(b).as("band"),
        (element_at(col("bits"), b * 3 + 1) * 4 +
          element_at(col("bits"), b * 3 + 2) * 2 +
          element_at(col("bits"), b * 3 + 3)).as("bval"))
    }
    val bands = withBits
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("bb.band").as("band"), col("bb.bval").as("bval"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        cosine(col("a.embedding"), col("a.nrm"), col("b.embedding"), col("b.nrm")).as("cos_sim"))
      .distinct()
    cand.filter(col("cos_sim") >= 0.95)
      .orderBy(col("a_id"), col("b_id"))
  }

  val embedDedupSql: String =
    s"""WITH ${Tables.embAugSql},
       |e AS (
       |  SELECT vec_id, embedding, $normSql AS nrm FROM emb_aug
       |), sig AS (
       |  SELECT vec_id, embedding, nrm,
       |         [ CASE WHEN list_sum([ embedding[i+1]::DOUBLE * ${coefSql("p", "i")}
       |                                for i in range(0, $Dim) ]) >= 0
       |                THEN 1 ELSE 0 END for p in range(0, $Planes) ] AS bits
       |  FROM e
       |), bands AS (
       |  SELECT vec_id, embedding, nrm, b,
       |         bits[b*3+1]*4 + bits[b*3+2]*2 + bits[b*3+3] AS bval
       |  FROM sig CROSS JOIN (SELECT unnest(range(0, $PlaneBands)) AS b)
       |)
       |SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
       |       ${cosineSql("a.embedding", "a.nrm", "b.embedding", "b.nrm")} AS cos_sim
       |FROM bands a JOIN bands b
       |  ON a.b = b.b AND a.bval = b.bval AND a.vec_id < b.vec_id
       |WHERE ${cosineSql("a.embedding", "a.nrm", "b.embedding", "b.nrm")} >= 0.95
       |ORDER BY a_id, b_id""".stripMargin
}
