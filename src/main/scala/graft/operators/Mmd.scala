package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q_mmd — maximum mean discrepancy between two embedding slices, for
  * the two kernels whose MMD has an EXACT moment closed form: the
  * linear kernel (MMD² = ‖Δμ‖² — pure mean shift) and the degree-2
  * polynomial kernel k(x,y) = (xᵀy)², whose feature map is vec(xxᵀ),
  * so MMD² = ‖M̂_ref − M̂_cur‖²_F over the per-slice second-moment
  * matrices — a SHAPE test. This is the distribution-shift detector
  * the drift family was missing one face of: `q_embed_drift` sees
  * cluster-mass movement, `q_embed_outliers` sees individual points,
  * the Gretton MMD sees the moment geometry — a slice whose mean
  * stays put while its covariance stretches (a new topic axis, a
  * collapsed embedding model) alarms ONLY here.
  *
  * Determinism: per-slice moments are [[graft.functions.MicroCovSum]]'s
  * exact micro-fixed integer sums (the Pca contract — order-free,
  * mergeable by addition); cross-slice numerators Δ = S_a·n_b − S_b·n_a
  * are exact (BigInt beyond long range, HUGEINT in the oracle); each
  * matrix cell fixes to a NANO-unit integer with ONE double division
  * before the sum of squares (the r6 discipline at nano grain), the
  * square sum folds in decimal/HUGEINT, and the final rescale is an
  * integer division. Identical slices give EXACTLY zero.
  *
  * Scale shape: two aggregator folds of the embeddings scan to
  * (d²+d+1)-long buffers (bounded-statistic collects, d=64 → 4161
  * longs); everything after is driver arithmetic on the bounded
  * matrices. Incremental: the buffers merge by addition
  * ([[Pca.mergeMoments]]), so a streaming re-test never rescans.
  */
object Mmd {

  private val D = Pca.Dim

  def mmdQuery(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    mmd(s,
      e.filter(col("vec_id") % 2 === 0).select(col("embedding")),
      e.filter(col("vec_id") % 2 =!= 0).select(col("embedding")))
  }

  /** 1-row MMD report over two embedding frames. */
  def mmd(s: SparkSession, ref: DataFrame, cur: DataFrame): DataFrame = {
    val a = Pca.moments(ref)
    val b = Pca.moments(cur)
    val (na, nb) = (a(D * D + D), b(D * D + D))
    val row =
      if (na == 0L || nb == 0L) Row(na, nb, null, null)
      else {
        val meanNano = (0 until D).map { i =>
          val num = a(D * D + i) * nb - b(D * D + i) * na
          // Δμ_i in nano units: num / (na·nb·1e6) · 1e9
          val dn = math.floor(num.toDouble * 1000.0 / (na.toDouble * nb) + 0.5).toLong
          BigInt(dn) * BigInt(dn)
        }.sum / BigInt(1000000000L)
        val shapeNano = (0 until D * D).map { ij =>
          val num = BigInt(a(ij)) * nb - BigInt(b(ij)) * na
          // ΔM̂_ij in nano units: num / (na·nb·1e12) · 1e9
          val dn = math.floor(num.toDouble / (na.toDouble * nb) / 1000.0 + 0.5).toLong
          BigInt(dn) * BigInt(dn)
        }.sum / BigInt(1000000000L)
        Row(na, nb, meanNano.toLong, shapeNano.toLong)
      }
    s.createDataFrame(java.util.List.of(row), StructType(Seq(
      StructField("n_ref", LongType, nullable = false),
      StructField("n_cur", LongType, nullable = false),
      StructField("mean_shift_nano", LongType, nullable = true),
      StructField("shape_shift_nano", LongType, nullable = true))))
  }

  val mmdSql: String =
    s"""WITH lbl AS (
       |  SELECT vec_id, (vec_id % 2 = 0) AS is_ref, embedding FROM embeddings
       |), mono AS MATERIALIZED (
       |  SELECT vec_id, is_ref, i,
       |         floor(embedding[i]::DOUBLE * 1000000.0 + 0.5)::BIGINT AS m
       |  FROM lbl, (SELECT unnest(generate_series(1, $D)) AS i)
       |), firsts AS (
       |  SELECT is_ref, i, sum(m)::BIGINT AS s1 FROM mono GROUP BY is_ref, i
       |), seconds AS (
       |  SELECT a.is_ref, a.i, b.i AS j, sum(a.m * b.m)::BIGINT AS s2
       |  FROM mono a JOIN mono b ON a.vec_id = b.vec_id
       |  GROUP BY a.is_ref, a.i, b.i
       |), ns AS (
       |  SELECT sum(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS na,
       |         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END)::BIGINT AS nb
       |  FROM lbl
       |), mean_nano AS (
       |  SELECT sum(dn * dn)::HUGEINT // 1000000000 AS v FROM (
       |    SELECT floor((fa.s1::HUGEINT * ns.nb - fb.s1::HUGEINT * ns.na)::DOUBLE
       |                 * 1000.0 / (ns.na::DOUBLE * ns.nb) + 0.5)::BIGINT AS dn
       |    FROM firsts fa JOIN firsts fb ON fa.i = fb.i
       |         AND fa.is_ref AND NOT fb.is_ref
       |    CROSS JOIN ns)
       |), shape_nano AS (
       |  SELECT sum(dn * dn)::HUGEINT // 1000000000 AS v FROM (
       |    SELECT floor((sa.s2::HUGEINT * ns.nb - sb.s2::HUGEINT * ns.na)::DOUBLE
       |                 / (ns.na::DOUBLE * ns.nb) / 1000.0 + 0.5)::BIGINT AS dn
       |    FROM seconds sa JOIN seconds sb ON sa.i = sb.i AND sa.j = sb.j
       |         AND sa.is_ref AND NOT sb.is_ref
       |    CROSS JOIN ns)
       |)
       |SELECT ns.na AS n_ref, ns.nb AS n_cur,
       |       CASE WHEN ns.na > 0 AND ns.nb > 0
       |            THEN (SELECT v FROM mean_nano) END::BIGINT AS mean_shift_nano,
       |       CASE WHEN ns.na > 0 AND ns.nb > 0
       |            THEN (SELECT v FROM shape_nano) END::BIGINT AS shape_shift_nano
       |FROM ns""".stripMargin
}
