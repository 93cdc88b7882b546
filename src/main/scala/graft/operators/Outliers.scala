package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-source outlier screening — the median/MAD modified
  * z-score (Iglewicz–Hoaglin, |z| > 3.5) over document token length.
  * Mean/stddev screens are themselves dragged by the outliers they
  * hunt; median and MAD have a 50% breakdown point, so one viral
  * megadoc cannot shift the gate for its whole source. Length is the
  * canonical target (truncated crawls and concatenated dumps are the
  * two most common corpus defects); the same shape applies to any
  * per-doc signal.
  *
  * Determinism: the median is the ELEMENT at rank ⌈n/2⌉ under
  * `(value, doc_id)` ordering (the `q_quantiles` convention — never
  * an interpolated average, so integer in, integer out), and MAD is
  * the same rank statistic over |x − med|. z is r6-rounded before
  * the 3.5 comparison, so the flag is bit-stable across engines.
  *
  * Scale: two per-source sort windows — exact order statistics, the
  * auditable form. Sources are low-cardinality, so each window is a
  * per-source sort; at 100 TB the same decision comes from the
  * mergeable [[QualitySketch]] histogram (±1-bin median/MAD) with
  * this exact form reserved for sampled audits — the
  * `q_quality_domain` / `q_quality_sketch` split, applied to robust
  * location/scale.
  */
object Outliers {

  /** Embedding-outlier report size. */
  val EmbedTopK = 20

  /** q_embed_outliers — standardized EMBEDDING-space outliers: each
    * vector's per-dimension squared z against the corpus's
    * per-dimension mean/std, summed over dims (diagonal Mahalanobis —
    * the full-covariance rotation is [[Pca]]'s job; the diagonal form
    * is the scan-cheap screen), top-[[EmbedTopK]] reported. The
    * vector-space face of the outlier family: [[lengthOutliers]]
    * catches defective TEXTS, this catches defective VECTORS (a
    * zeroed/clipped/mis-normalized embedding batch lights up here
    * before it poisons ANN recall or k-means centroids).
    *
    * Determinism: components fix to integer micro-units; per-dim
    * moment sums are exact BIGINTs folded once; mean/std and each
    * dim's z² run in double with identical shapes, and the per-vector
    * sum folds IN ARRAY-INDEX ORDER (a per-row `aggregate` lambda —
    * deterministic like the [[graft.functions.VecDot]] contract, no
    * partition order anywhere); the score r6-rounds once; zero-std
    * dims contribute 0 (guard). Top-k ties break on vec_id.
    *
    * Scale: one corpus fold to d moment rows (posexplode + partial
    * agg), stats broadcast back as d-array literals riding a 1-row
    * frame, one scoring scan into a TakeOrdered top-k — the corpus
    * never shuffles.
    */
  def embedOutliers(vectors: DataFrame, k: Int = EmbedTopK): DataFrame = {
    val micro = vectors.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1e6 + 0.5).cast("long")).as("m"))
    // n·ss and s² overflow BIGINT past ~13k vectors at this micro
    // scale — the variance product runs in exact DECIMAL(38,0)
    // (HUGEINT on the oracle side) before the one cast to double.
    val dims = micro
      .select(posexplode(col("m")).as(Seq("d", "v")))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("ss"))
      .select(col("d"),
        (col("s").cast("double") / col("n").cast("double")).as("mean"),
        sqrt((col("n").cast("decimal(38,0)") * col("ss") -
          col("s").cast("decimal(38,0)") * col("s")).cast("double") /
          (col("n").cast("double") * (col("n") - 1).cast("double"))).as("std"))
    // per-dim mean/std as index-ordered array literals on ONE row
    val stats = dims
      .agg(
        transform(array_sort(collect_list(struct(col("d"), col("mean"), col("std")))),
          r => r.getField("mean")).as("means"),
        transform(array_sort(collect_list(struct(col("d"), col("mean"), col("std")))),
          r => r.getField("std")).as("stds"))
    micro.crossJoin(broadcast(stats))
      .select(col("vec_id"),
        TextSim.r6(aggregate(
          sequence(lit(0), size(col("m")) - 1),
          lit(0.0),
          (acc, i) => acc + when(element_at(col("stds"), i + 1) > 0,
            ((element_at(col("m"), i + 1).cast("double") -
              element_at(col("means"), i + 1)) / element_at(col("stds"), i + 1)) *
              ((element_at(col("m"), i + 1).cast("double") -
                element_at(col("means"), i + 1)) / element_at(col("stds"), i + 1)))
            .otherwise(lit(0.0)))).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** q_embed_outliers over the embeddings table. */
  def embedOutliersQuery(s: SparkSession, d: String): DataFrame =
    embedOutliers(Tables.embeddings(s, d).select(col("vec_id"), col("embedding")))

  val embedOutliersSql: String = {
    val mExpr = "[floor(x::DOUBLE * 1000000.0 + 0.5)::BIGINT for x in embedding]"
    val z = "((m[i]::DOUBLE - means[i]) / stds[i])"
    s"""WITH micro AS (
       |  SELECT vec_id, $mExpr AS m FROM embeddings
       |), dims AS (
       |  SELECT d, count(*)::BIGINT AS n, sum(v)::BIGINT AS s,
       |         sum(v * v)::BIGINT AS ss
       |  FROM (SELECT unnest(m) AS v, generate_subscripts(m, 1) AS d FROM micro)
       |  GROUP BY d
       |), dstats AS (
       |  SELECT d, s::DOUBLE / n::DOUBLE AS mean,
       |         sqrt((n::HUGEINT * ss - s::HUGEINT * s)::DOUBLE
       |              / (n::DOUBLE * (n - 1)::DOUBLE)) AS std
       |  FROM dims
       |), stats AS (
       |  SELECT list(mean ORDER BY d) AS means,
       |         list(std ORDER BY d) AS stds
       |  FROM dstats
       |), scored AS (
       |  SELECT vec_id,
       |         ${TextSim.r6Sql(
      s"list_sum([CASE WHEN stds[i] > 0 THEN $z * $z ELSE 0.0 END for i in range(1, len(m) + 1)])")} AS score
       |  FROM micro CROSS JOIN stats
       |)
       |SELECT vec_id, score FROM scored
       |ORDER BY score DESC, vec_id
       |LIMIT $EmbedTopK""".stripMargin
  }

  /** Modified-z multiplier (Φ⁻¹(0.75) — MAD→σ consistency constant). */
  val MadConsistency = 0.6745

  /** Flag threshold on |modified z|. */
  val ZCut = 3.5

  /** Per-doc robust z over token length for any
    * `(doc_id, source, text)` frame: `(doc_id, source, n_tokens,
    * med, mad, z, is_outlier)`. `z` is null where MAD is 0 (a
    * degenerate source where over half the docs share one length —
    * no scale to score against).
    */
  def lengthOutliers(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(TextSim.tokens(col("text"))).cast("long").as("n_tokens"))
    val bySrc = Window.partitionBy(col("source"))
    val med = toks
      .withColumn("rn", row_number().over(
        bySrc.orderBy(col("n_tokens"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(bySrc))
      .groupBy(col("source"))
      .agg(max(when(col("rn") === ceil(col("cnt") * lit(0.5)),
        col("n_tokens"))).as("med"))
    val dev = toks.join(broadcast(med), "source")
      .withColumn("adev", abs(col("n_tokens") - col("med")))
    val mad = dev
      .withColumn("rn", row_number().over(
        bySrc.orderBy(col("adev"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(bySrc))
      .groupBy(col("source"))
      .agg(max(when(col("rn") === ceil(col("cnt") * lit(0.5)),
        col("adev"))).as("mad"))
    val z = TextSim.r6(
      (lit(MadConsistency) * (col("n_tokens") - col("med")).cast("double")) /
        col("mad").cast("double"))
    dev.join(broadcast(mad), "source")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("med"), col("mad"),
        when(col("mad") > 0, z).as("z"),
        (col("mad") > 0 && abs(when(col("mad") > 0, z)) > ZCut)
          .as("is_outlier"))
  }

  /** q_outliers — [[lengthOutliers]] over `documents`. */
  def outliersQuery(s: SparkSession, d: String): DataFrame =
    lengthOutliers(Tables.documents(s, d)).orderBy(col("doc_id"))

  val outliersSql: String = {
    val zE = s"($MadConsistency * (n_tokens - med)::DOUBLE) / mad::DOUBLE"
    val zR = TextSim.r6Sql(zE)
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
       |  FROM documents
       |), r1 AS (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY source) AS cnt
       |  FROM t
       |), med AS (
       |  SELECT source, max(CASE WHEN rn = ceil(cnt * 0.5) THEN n_tokens END) AS med
       |  FROM r1 GROUP BY source
       |), d AS (
       |  SELECT t.*, m.med, abs(t.n_tokens - m.med) AS adev
       |  FROM t JOIN med m USING (source)
       |), r2 AS (
       |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY adev, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY source) AS cnt
       |  FROM d
       |), mad AS (
       |  SELECT source, max(CASE WHEN rn = ceil(cnt * 0.5) THEN adev END) AS mad
       |  FROM r2 GROUP BY source
       |)
       |SELECT d.doc_id, d.source, d.n_tokens, d.med, m2.mad,
       |       CASE WHEN m2.mad > 0 THEN $zR END AS z,
       |       (m2.mad > 0 AND abs(CASE WHEN m2.mad > 0 THEN $zR END) > $ZCut) AS is_outlier
       |FROM d JOIN mad m2 USING (source)
       |ORDER BY doc_id""".stripMargin
  }
}
