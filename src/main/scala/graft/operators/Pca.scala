package graft.operators

import graft.Tables
import graft.functions.{MicroCovSum, RotateVec}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PCA over the embedding corpus — the DATA-DRIVEN dimensionality
  * reduction next to [[RandProj]]'s data-blind JL projection (random
  * signs preserve distances in expectation at any target dim; PCA
  * finds the directions this corpus actually varies in, so at equal
  * target dim it keeps strictly more variance on anisotropic data) and
  * the analysis face of [[OPQ]] (same Jacobi eigensolver; OPQ rotates
  * to balance variance for PQ, PCA ranks directions to truncate).
  *
  * Scale shape: the corpus folds ONCE through [[MicroCovSum]] (map-side
  * d²-buffer partials, nothing but ~33 KB buffers cross the wire); the
  * 64×64 eigendecomposition runs driver-side (microseconds — the
  * [[OPQ]] position: no linear-algebra dependency ships to tasks);
  * projection is a per-row codegen mat-vec ([[RotateVec]] with the
  * p×d component matrix) riding the scan — no shuffle anywhere.
  *
  * Determinism: moment sums are exact micro-unit longs (the covariance
  * itself is the hash-verified `q_embed_cov`); the Jacobi sweep order
  * is fixed; eigenvector sign is pinned by convention (largest-|entry|
  * component positive), so `fit` is bit-reproducible for a given
  * corpus.
  */
object Pca {

  val Dim: Int = Ann.Dim

  final case class Model(mean: Array[Double], eigvals: Array[Double],
    components: Array[Array[Double]]) {
    /** Fraction of total variance the kept components carry. */
    def explained: Double = {
      val kept = eigvals.take(components.length).sum
      kept / eigvals.sum
    }
  }

  /** The exact micro moment buffer of a corpus (d² pair sums ++ d
    * component sums ++ count) — PCA's sufficient statistic. Being
    * exact integers, buffers from disjoint batches MERGE BY ADDITION
    * ([[mergeMoments]]) bit-exactly: refreshing the covariance after
    * an ingest batch never rescans old vectors (the `bm25Stats` /
    * `vocabCounts` contract applied to second moments).
    */
  def moments(emb: DataFrame): Array[Long] = {
    val s = emb.sparkSession
    import s.implicits._
    val agg = new MicroCovSum(Dim)
    emb.select(col("embedding").cast("array<float>"))
      .as[Seq[Float]].select(agg.toColumn).head().toArray
  }

  /** Elementwise addition — exact, any order, any batch split. */
  def mergeMoments(a: Array[Long], b: Array[Long]): Array[Long] =
    a.zip(b).map { case (x, y) => x + y }

  /** Deterministic eigensolve over a moment buffer (shared by the
    * one-shot and incremental paths — same buffer, same model, bit
    * for bit).
    */
  def fitFromMoments(b: Array[Long], p: Int): Model = {
    val n = b(Dim * Dim + Dim).toDouble
    val mean = Array.tabulate(Dim)(i => b(Dim * Dim + i) / n / 1e6)
    // covariance in embedding units: (Σmᵢmⱼ/n − μᵢμⱼ·1e12) · 1e-12
    val cov = Array.tabulate(Dim, Dim) { (i, j) =>
      (b(i * Dim + j) / n - (b(Dim * Dim + i) / n) * (b(Dim * Dim + j) / n)) / 1e12
    }
    val (evals, v) = OPQ.eigSym(cov)
    val order = evals.indices.sortBy(i => -evals(i))
    val comps = order.take(p).map { k =>
      val c = Array.tabulate(Dim)(i => v(i)(k))
      // sign convention: the largest-|entry| coordinate is positive
      val dom = c.indices.maxBy(i => (math.abs(c(i)), -i))
      if (c(dom) < 0) c.map(x => -x) else c
    }.toArray
    Model(mean, order.map(evals(_)).toArray, comps)
  }

  /** One corpus pass → exact micro moment sums → driver-side Jacobi. */
  def fit(emb: DataFrame, p: Int): Model = fitFromMoments(moments(emb), p)

  /** Project `(vec_id, embedding)` onto the model's components:
    * y = C·x − C·μ, the centering folded into a literal offset so the
    * scan-side work is one codegen mat-vec and a zip_with.
    */
  def project(emb: DataFrame, model: Model): DataFrame = {
    val offset = model.components.map(c =>
      c.zip(model.mean).map { case (a, b) => a * b }.sum.toFloat)
    emb.select(col("vec_id"),
      zip_with(
        RotateVec(col("embedding").cast("array<float>"), model.components),
        lit(offset),
        (a, b) => (a - b).cast("float")).as("embedding"))
  }

  /** q_embed_cov — the exact micro-unit moment sums behind the
    * covariance (upper triangle): Σmᵢmⱼ, Σmᵢ, Σmⱼ, n per (i, j). This
    * IS the PCA sufficient statistic — hash-verifying it verifies
    * everything data-dependent upstream of the (driver-side,
    * deterministic) eigensolve. 1-based dims to match the oracle's
    * list indexing.
    */
  def embedCov(s: SparkSession, d: String): DataFrame = {
    val b = moments(Tables.embeddings(s, d))
    val n = b(Dim * Dim + Dim)
    val rows = for (i <- 0 until Dim; j <- i until Dim) yield
      Row((i + 1).toLong, (j + 1).toLong, b(i * Dim + j),
        b(Dim * Dim + i), b(Dim * Dim + j), n)
    val schema = StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("sxy", LongType, nullable = false),
      StructField("sx", LongType, nullable = false),
      StructField("sy", LongType, nullable = false),
      StructField("n_vecs", LongType, nullable = false)))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
  }

  val embedCovSql: String =
    s"""WITH m AS (
       |  SELECT [floor(embedding[i]::DOUBLE * 1000000 + 0.5)::BIGINT
       |          for i in range(1, ${Dim + 1})] AS mv
       |  FROM embeddings
       |), grid AS (
       |  SELECT a.i AS i, b.i AS j
       |  FROM (SELECT unnest(range(1, ${Dim + 1})) AS i) a,
       |       (SELECT unnest(range(1, ${Dim + 1})) AS i) b
       |  WHERE a.i <= b.i
       |)
       |SELECT g.i::BIGINT AS i, g.j::BIGINT AS j,
       |       sum(mv[g.i] * mv[g.j])::BIGINT AS sxy,
       |       sum(mv[g.i])::BIGINT AS sx,
       |       sum(mv[g.j])::BIGINT AS sy,
       |       count(*)::BIGINT AS n_vecs
       |FROM m CROSS JOIN grid g
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
}
