package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Leading principal direction of the embedding covariance by
  * DETERMINISTIC integer power iteration — the hash-verifiable
  * eigensolve: [[Pca]]'s Jacobi sweep is driver-side floating point
  * (bit-reproducible but not oracle-expressible), so its q_embed_cov
  * oracle stops at the sufficient statistic. Power iteration closes
  * that gap: a FIXED number of rounds of v ← K·v over the exact
  * integer moment matrix, renormalized to a bounded integer lattice
  * each round, is pure integer arithmetic end to end — both engines
  * run the SAME eight rounds and must agree bit for bit, eigensolve
  * included.
  *
  * K(i,j) = n·Σmᵢmⱼ − Σmᵢ·Σmⱼ (covariance × n²·1e12 — a positive
  * scale, so the eigenvector is unchanged) in BigInt/HUGEINT (n·Σ
  * overflows int64 past ~10^4 vectors). v₀ = all-ones; each round
  * v' = (K·v)·1e3 div max|K·v| keeps components on the ±1000 lattice
  * (div truncates toward zero in both engines, negatives verified).
  * The readout is the Rayleigh share λ̂/tr(K) = vᵀKv·1e6 div
  * (vᵀv·trK) — scale-free "variance fraction of the top direction",
  * the anisotropy number [[RandProj]] vs [[Pca]] decisions hinge on.
  *
  * Convergence contract: the iterate aligns at rate (λ₂/λ₁)^R, so on
  * ANISOTROPIC data eight rounds recover the Jacobi eigenvector
  * (PowerIterSpec: |cos| > 0.999 on a planted-direction corpus, share
  * ≡ eigenvalue share); on a near-degenerate spectrum — the driver
  * corpus measures λ₁/λ₂ ≈ 1.013, where "the" top eigenvector is
  * ill-conditioned by definition — the readout is an honest Rayleigh
  * LOWER BOUND on λ₁/tr, still bit-deterministic in both engines
  * (which is what the oracle hash checks).
  *
  * Scale: the corpus folds ONCE through [[graft.functions.MicroCovSum]]
  * (d²-buffer map-side partials); the iteration runs on the d²-cell
  * lattice — driver-side here, a 64×64 matrix; the same rounds run as
  * joins at any d. Output: one row per dimension `(dim, v_milli,
  * top_share_micro)`.
  */
object PowerIter {

  val Rounds = 8
  private val Dim = Pca.Dim

  def powerIter(s: SparkSession, d: String): DataFrame =
    powerIterFromMoments(s, Pca.moments(Tables.embeddings(s, d)))

  /** The iteration over any exact moment buffer (the [[Pca.moments]]
    * layout) — shared with PowerIterSpec's planted-direction fixture.
    */
  def powerIterFromMoments(s: SparkSession, b: Array[Long]): DataFrame = {
    val n = BigInt(b(Dim * Dim + Dim))
    def sx(i: Int) = BigInt(b(Dim * Dim + i))
    val k = Array.tabulate(Dim, Dim)((i, j) =>
      n * BigInt(b(i * Dim + j)) - sx(i) * sx(j))
    var v = Array.fill(Dim)(BigInt(1000))
    for (_ <- 1 to Rounds) {
      val w = Array.tabulate(Dim)(i =>
        (0 until Dim).map(j => k(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      v = if (m == 0) Array.fill(Dim)(BigInt(0))
      else w.map(x => x * 1000 / m)
    }
    val vkv = (for (i <- 0 until Dim; j <- 0 until Dim)
      yield k(i)(j) * v(i) * v(j)).sum
    val vv = v.map(x => x * x).sum
    val tr = (0 until Dim).map(i => k(i)(i)).sum
    val share =
      if (vv == 0 || tr == 0) 0L
      else (vkv * 1000000 / (vv * tr)).toLong
    val rows = (0 until Dim).map(i =>
      Row((i + 1).toLong, v(i).toLong, share))
    val schema = StructType(Seq(
      StructField("dim", LongType, nullable = false),
      StructField("v_milli", LongType, nullable = false),
      StructField("top_share_micro", LongType, nullable = false)))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
  }

  val powerIterSql: String = {
    def round(r: Int): String =
      s"""w$r AS (
         |  SELECT k.i, sum(k.kv * v.v)::HUGEINT AS w
         |  FROM kc k JOIN v${r - 1} v ON v.i = k.j
         |  GROUP BY k.i
         |), m$r AS (SELECT max(abs(w))::HUGEINT AS m FROM w$r),
         |v$r AS MATERIALIZED (
         |  SELECT w.i,
         |         CASE WHEN m.m = 0 THEN 0
         |              ELSE (w.w * 1000 // m.m)::BIGINT END AS v
         |  FROM w$r w CROSS JOIN m$r m
         |)""".stripMargin
    s"""WITH mv AS MATERIALIZED (
       |  SELECT [floor(embedding[i]::DOUBLE * 1000000 + 0.5)::BIGINT
       |          for i in range(1, ${Dim + 1})] AS mv
       |  FROM embeddings
       |), grid AS (
       |  SELECT a.i AS i, b.i AS j
       |  FROM (SELECT unnest(range(1, ${Dim + 1})) AS i) a,
       |       (SELECT unnest(range(1, ${Dim + 1})) AS i) b
       |), kc AS MATERIALIZED (
       |  SELECT g.i, g.j,
       |         (count(*)::HUGEINT * sum(mv[g.i] * mv[g.j])::HUGEINT
       |          - sum(mv[g.i])::HUGEINT * sum(mv[g.j])::HUGEINT) AS kv
       |  FROM mv CROSS JOIN grid g
       |  GROUP BY g.i, g.j
       |), v0 AS (SELECT unnest(range(1, ${Dim + 1}))::BIGINT AS i,
       |                 1000::BIGINT AS v),
       |${(1 to Rounds).map(round).mkString(",\n")},
       |ray AS (
       |  SELECT
       |    (SELECT sum(k.kv * a.v * b.v)
       |     FROM kc k JOIN v$Rounds a ON a.i = k.i
       |     JOIN v$Rounds b ON b.i = k.j)::HUGEINT AS vkv,
       |    (SELECT sum(v * v) FROM v$Rounds)::HUGEINT AS vv,
       |    (SELECT sum(kv) FROM kc WHERE i = j)::HUGEINT AS tr
       |)
       |SELECT v.i::BIGINT AS dim, v.v::BIGINT AS v_milli,
       |       (CASE WHEN r.vv = 0 OR r.tr = 0 THEN 0
       |             ELSE (r.vkv * 1000000) // (r.vv * r.tr) END)::BIGINT
       |         AS top_share_micro
       |FROM v$Rounds v CROSS JOIN ray r
       |ORDER BY dim""".stripMargin
  }
}
