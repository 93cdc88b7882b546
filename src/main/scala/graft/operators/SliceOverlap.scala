package graft.operators

import graft.Tables
import graft.functions.{BottomKByHash, HashedVal, TextSim}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-slice set-overlap estimation from bottom-k signatures — the
  * KMV estimator for |A∩B|/|A∪B| (Beyer et al., SIGMOD'07). [[Hll]]
  * answers per-slice cardinality and UNION (register max) but
  * structurally cannot estimate intersections; pairwise overlap —
  * how much does this week's crawl repeat last week's, which sources
  * mirror each other, is a new dump worth ingesting — needs an
  * element SAMPLE, not a register table. A bottom-k-by-hash signature
  * per slice is that sample: deterministic in the data (same
  * merge-exact / duplicate-blind contract as [[Kmv]], same
  * [[BottomKByHash]] state), and for any two slices the k smallest
  * hashes of the signature UNION are a uniform sample of A∪B, so the
  * fraction present in both estimates Jaccard with O(1/√k) error.
  *
  * Scale shape: signatures fold in ONE ObjectHashAggregate (≤ k rows
  * per slice per partition cross the wire — the corpus shuffles
  * nothing else); everything pairwise downstream touches only the
  * ≤ |slices|·k signature frame with the bounded pair list broadcast
  * past it. Pairwise output is |slices|² — this operator is for
  * bounded slice sets (sources, weekly snapshots, shards), not
  * per-document keys; per-doc similarity is the dedup family's job.
  */
object SliceOverlap {

  /** Signature size: 256 → ~3% σ on a mid-range Jaccard. */
  val K = 256

  /** Per-key bottom-k element-hash signature `(key, h)` of a frame's
    * element column. Duplicate elements hash identically and are
    * dropped on insert, so no pre-distinct pass is needed and replayed
    * batches can't skew the sample.
    */
  def signatures(df: DataFrame, keyCol: String, elemCol: String,
    k: Int = K): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val agg = new BottomKByHash(k)
    df.select(col(keyCol).cast("string").as("key"),
      md5(col(elemCol)).as("h"), lit(0.0).as("v"))
      .as[HashedVal]
      .groupByKey(_.key)
      .agg(agg.toColumn.name("kept"))
      .toDF("key", "kept")
      .select(col("key"), explode(col("kept.h")).as("h"))
  }

  /** Merge signature frames (incremental refresh): union + re-cut to
    * the k smallest per key — byte-identical to one-shot sketching.
    */
  def merge(a: DataFrame, b: DataFrame, k: Int = K): DataFrame = {
    val s = a.sparkSession
    import s.implicits._
    val agg = new BottomKByHash(k)
    a.unionByName(b)
      .select(col("key"), col("h"), lit(0.0).as("v"))
      .as[HashedVal]
      .groupByKey(_.key)
      .agg(agg.toColumn.name("kept"))
      .toDF("key", "kept")
      .select(col("key"), explode(col("kept.h")).as("h"))
  }

  /** Pairwise Jaccard estimates over every unordered key pair: the
    * union of the two signatures re-cut to its k smallest hashes, the
    * estimate = fraction of that cut present in both. All frames are
    * signature-sized; the pair list broadcasts.
    */
  def overlapPairs(sig: DataFrame, k: Int = K): DataFrame = {
    val keys = sig.select(col("key")).distinct()
    val pairs = keys.as("ka").join(keys.as("kb"),
      col("ka.key") < col("kb.key"))
      .select(col("ka.key").as("pa"), col("kb.key").as("pb"))
    // two broadcast EQUI-joins (an OR-condition join would plan as a
    // per-row nested loop over the pair list), unioned then folded
    val ta = sig.join(broadcast(pairs), col("key") === col("pa"))
      .select(col("pa"), col("pb"), col("h"), lit(1).as("ia"), lit(0).as("ib"))
    val tb = sig.join(broadcast(pairs), col("key") === col("pb"))
      .select(col("pa"), col("pb"), col("h"), lit(0).as("ia"), lit(1).as("ib"))
    val tagged = ta.unionByName(tb)
      .groupBy(col("pa"), col("pb"), col("h"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    val cut = tagged.withColumn("rh",
      row_number().over(
        Window.partitionBy(col("pa"), col("pb")).orderBy(col("h"))))
      .filter(col("rh") <= k)
    // containment |A∩B|/|A| reads off the same cut: restrict the
    // uniform union sample to A's elements (an unbiased sample of A)
    // and take the in-B share — the slice-level form of the
    // [[FpOverlap]] asymmetry (a mirrored subset scores ~1 against
    // its superset while Jaccard stays low).
    cut.groupBy(col("pa").as("source_a"), col("pb").as("source_b"))
      .agg(count(lit(1)).cast("long").as("n_sample"),
        TextSim.r6(sum(col("ia") * col("ib")).cast("double") /
          count(lit(1)).cast("double")).as("est_jaccard"),
        // a side can contribute nothing to the cut only under extreme
        // size asymmetry (all of A's hashes above B's k-th) — report
        // null rather than an engine-dependent inf
        when(sum(col("ia")) === 0, lit(null).cast("double"))
          .otherwise(TextSim.r6(sum(col("ia") * col("ib")).cast("double") /
            sum(col("ia")).cast("double"))).as("est_contain_a"),
        when(sum(col("ib")) === 0, lit(null).cast("double"))
          .otherwise(TextSim.r6(sum(col("ia") * col("ib")).cast("double") /
            sum(col("ib")).cast("double"))).as("est_contain_b"))
  }

  /** q_slice_overlap — pairwise shingle-set Jaccard between sources
    * (which domains mirror each other's content), estimated from
    * k=256 signatures of each source's distinct word-3-gram set.
    */
  def sliceOverlap(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("source"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("source"), explode(TextSim.shingles3(col("t"))).as("g"))
    overlapPairs(signatures(docs, "source", "g"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val sliceOverlapSql: String =
    s"""WITH toks AS (
       |  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS t
       |  FROM documents
       |), elems AS (
       |  SELECT DISTINCT source AS key, md5(g) AS h
       |  FROM (SELECT source, unnest(${TextSim.shingles3Sql("t")}) AS g
       |        FROM toks WHERE len(t) >= 3)
       |), ranked AS (
       |  SELECT key, h, row_number() OVER (PARTITION BY key ORDER BY h) AS rh
       |  FROM elems
       |), sig AS (
       |  SELECT key, h FROM ranked WHERE rh <= $K
       |), keys AS (
       |  SELECT DISTINCT key FROM sig
       |), pairs AS (
       |  SELECT a.key AS pa, b.key AS pb FROM keys a JOIN keys b ON a.key < b.key
       |), tagged AS (
       |  SELECT p.pa, p.pb, s.h,
       |         max(CASE WHEN s.key = p.pa THEN 1 ELSE 0 END) AS ia,
       |         max(CASE WHEN s.key = p.pb THEN 1 ELSE 0 END) AS ib
       |  FROM pairs p JOIN sig s ON s.key = p.pa OR s.key = p.pb
       |  GROUP BY 1, 2, 3
       |), cut AS (
       |  SELECT *, row_number() OVER (PARTITION BY pa, pb ORDER BY h) AS rh
       |  FROM tagged
       |)
       |SELECT pa AS source_a, pb AS source_b,
       |       count(*)::BIGINT AS n_sample,
       |       ${TextSim.r6Sql("sum(ia * ib)::DOUBLE / count(*)::DOUBLE")} AS est_jaccard,
       |       CASE WHEN sum(ia) = 0 THEN NULL
       |            ELSE ${TextSim.r6Sql("sum(ia * ib)::DOUBLE / sum(ia)::DOUBLE")} END AS est_contain_a,
       |       CASE WHEN sum(ib) = 0 THEN NULL
       |            ELSE ${TextSim.r6Sql("sum(ia * ib)::DOUBLE / sum(ib)::DOUBLE")} END AS est_contain_b
       |FROM cut WHERE rh <= $K
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
}
