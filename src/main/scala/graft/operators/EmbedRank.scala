package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q_embed_rank — EFFECTIVE RANK of the embedding distribution, the
  * participation ratio PR = (tr C)² / tr(C²) over the covariance C
  * (Roy–Vetterli's effective-rank family; the physics participation
  * ratio): how many dimensions the corpus actually USES. A healthy
  * d-dim embedding model spreads variance (PR ≈ tens); a COLLAPSED
  * model (anisotropy, dead dimensions — the classic failure of
  * contrastive training) concentrates it (PR → 1). This is the
  * one-number collapse diagnostic next to `q_embed_cov`'s full matrix
  * and `q_mmd`'s two-slice comparison — the quantity needs NO
  * eigensolve, because tr C = Σλ and tr C² = Σλ² are pure moment
  * arithmetic, which is what makes it oracle-able and exact.
  *
  * Determinism: the same discipline as [[Mmd]] — exact micro-fixed
  * integer moment sums ([[graft.functions.MicroCovSum]]); each
  * covariance cell's exact numerator n·M_ij − S_i·S_j (BigInt /
  * HUGEINT) fixes to a NANO-unit integer with ONE double division;
  * traces fold as exact integer squares in decimal range; one r6
  * division at the end. Degenerate (n < 2 or zero variance) → NULL.
  *
  * Scale: one aggregator fold of the embeddings scan to the
  * (d²+d+1)-long bounded buffer; driver arithmetic after; incremental
  * by moment addition ([[Pca.mergeMoments]]).
  */
object EmbedRank {

  private val D = Pca.Dim

  def embedRankQuery(s: SparkSession, d: String): DataFrame =
    embedRank(s, Tables.embeddings(s, d).select(col("embedding")))

  /** 1-row effective-rank report over an embedding frame. */
  def embedRank(s: SparkSession, emb: DataFrame): DataFrame = {
    val b = Pca.moments(emb)
    val n = b(D * D + D)
    val row =
      if (n < 2L) Row(n, D.toLong, null, null)
      else {
        // nano-fixed covariance cells: (n·M_ij − S_i·S_j)/(n²·1e12)·1e9
        def cell(ij: Int, i: Int, j: Int): Long = {
          val num = BigInt(b(ij)) * n - BigInt(b(D * D + i)) * BigInt(b(D * D + j))
          math.floor(num.toDouble / (n.toDouble * n) / 1000.0 + 0.5).toLong
        }
        val cells = Array.tabulate(D, D)((i, j) => cell(i * D + j, i, j))
        val tr = (0 until D).map(i => BigInt(cells(i)(i))).sum
        // tr(C²) = Σ c_ij·c_ji = Σ c_ij² — the nano-fixed matrix is
        // exactly symmetric (numerators are, and the fix is per-cell)
        val tr2 = (for (i <- 0 until D; j <- 0 until D)
          yield BigInt(cells(i)(j)) * BigInt(cells(i)(j))).sum
        if (tr2 == 0) Row(n, D.toLong, tr.toLong, null)
        else {
          val pr = (tr * tr).toDouble / tr2.toDouble
          Row(n, D.toLong, tr.toLong,
            java.lang.Double.valueOf(math.floor(pr * 1e6 + 0.5) / 1e6))
        }
      }
    s.createDataFrame(java.util.List.of(row), StructType(Seq(
      StructField("n_vecs", LongType, nullable = false),
      StructField("dim", LongType, nullable = false),
      StructField("trace_nano", LongType, nullable = true),
      StructField("eff_rank", DoubleType, nullable = true))))
  }

  val embedRankSql: String =
    s"""WITH lbl AS (
       |  SELECT vec_id, embedding FROM embeddings
       |), mono AS MATERIALIZED (
       |  SELECT vec_id, i,
       |         floor(embedding[i]::DOUBLE * 1000000.0 + 0.5)::BIGINT AS m
       |  FROM lbl, (SELECT unnest(generate_series(1, $D)) AS i)
       |), firsts AS (
       |  SELECT i, sum(m)::BIGINT AS s1 FROM mono GROUP BY i
       |), seconds AS (
       |  SELECT a.i, b.i AS j, sum(a.m * b.m)::BIGINT AS s2
       |  FROM mono a JOIN mono b ON a.vec_id = b.vec_id
       |  GROUP BY a.i, b.i
       |), nn AS (
       |  SELECT count(*)::BIGINT AS n FROM lbl
       |), cells AS (
       |  SELECT s.i, s.j,
       |         floor((s.s2::HUGEINT * nn.n - fa.s1::HUGEINT * fb.s1)::DOUBLE
       |               / (nn.n::DOUBLE * nn.n) / 1000.0 + 0.5)::BIGINT AS c
       |  FROM seconds s
       |  JOIN firsts fa ON fa.i = s.i
       |  JOIN firsts fb ON fb.i = s.j
       |  CROSS JOIN nn
       |), traces AS (
       |  SELECT sum(CASE WHEN i = j THEN c ELSE 0 END)::HUGEINT AS tr,
       |         sum(c::HUGEINT * c)::HUGEINT AS tr2
       |  FROM cells
       |)
       |SELECT nn.n AS n_vecs, $D::BIGINT AS dim,
       |       CASE WHEN nn.n >= 2 THEN tr END::BIGINT AS trace_nano,
       |       CASE WHEN nn.n >= 2 AND tr2 <> 0 THEN
       |         floor((tr * tr)::DOUBLE / tr2::DOUBLE * 1000000.0 + 0.5)
       |           / 1000000.0 END AS eff_rank
       |FROM nn CROSS JOIN traces""".stripMargin
}
