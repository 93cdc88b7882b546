package graft.sources

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-backed signature table — the cluster-scale form of the
  * persist barrier in [[Dedup.minhashSignatures]].
  *
  * Locally a `persist()` stops Catalyst's project-collapse from
  * re-inlining the md5 hash family into every band lambda; on a
  * 1000-executor run against 100 TB the same barrier should be a table
  * written ONCE and read by every consumer (the band join, the verify
  * re-join, a later `q_dedup_keep` pass, next week's incremental run) —
  * executor loss doesn't recompute it, and separate jobs can share it.
  * Bucketing by doc_id pre-partitions the verify re-joins
  * (candidates ⋈ signatures on doc_id) on the sig side.
  */
object SignatureStore {

  /** Compute and write the minhash signature table `(doc_id, sh, sig)`
    * for a `(doc_id, text)` corpus, bucketed by doc_id.
    */
  def build(docs: DataFrame, table: String, buckets: Int = 16): Unit =
    Dedup.minhashSignatures(Dedup.shingleDocs(docs))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(table)

  /** Verified near-dup pairs reading signatures from the store — no
    * signature recompute, identical output to [[Dedup.minhashPairs]].
    */
  def pairs(spark: SparkSession, table: String): DataFrame =
    Dedup.minhashPairsFrom(spark.table(table))

  /** Incremental dedup — the operator a weekly ingest actually runs:
    * near-dup pairs INVOLVING A NEW DOC, from a new `(doc_id, text)`
    * batch against the stored signature corpus, without recomputing or
    * rescanning old×old (those pairs were emitted when their batch
    * arrived). Returns `(a_id, b_id, jaccard)` with a_id < b_id.
    *
    * Scale shape: new signatures are computed once (batch-sized);
    * new×new goes through the salted self-join; new×old BROADCASTS the
    * new band table against the stored one — an incremental batch is
    * bounded (day's crawl), the corpus isn't, so the stream-past join
    * touches no stored-side shuffle at all. Verification joins the
    * union signature table on candidate ids only. Caller appends the
    * new signatures via [[append]] after a successful run — ids must
    * be new (the store is the identity authority, mirroring the
    * reference manifest's incremental contract).
    */
  def incrementalPairs(spark: SparkSession, newDocs: DataFrame,
    table: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val newSig = Dedup.minhashSignatures(Dedup.shingleDocs(newDocs))
    val oldSig = spark.table(table)
    val newNew = Dedup.minhashPairsRaw(newSig)
    val cand = Dedup.bandsOf(oldSig).as("o")
      .join(broadcast(Dedup.bandsOf(newSig).as("n")), Seq("band", "bsig"))
      .select(least(col("o.doc_id"), col("n.doc_id")).as("a_id"),
        greatest(col("o.doc_id"), col("n.doc_id")).as("b_id"))
      // a doc present on BOTH sides (the caller broke the ids-must-be-new
      // contract, or read this frame lazily after its own append) would
      // otherwise emit a degenerate (x, x) self-pair
      .filter(col("a_id") =!= col("b_id"))
      .distinct()
    val newOld = Dedup.verifyJaccard(cand,
      oldSig.select(col("doc_id"), col("sh"))
        .unionByName(newSig.select(col("doc_id"), col("sh"))))
    newNew.unionByName(newOld).orderBy(col("a_id"), col("b_id"))
  }

  /** Append a new batch's signatures to the store, reading the bucket
    * spec off the existing catalog table — an append with a DIFFERENT
    * bucket count than the build would fail at runtime (or silently
    * break the bucket-pruned verify joins), so the store, not the
    * caller, is the authority on its own layout.
    */
  def append(newDocs: DataFrame, table: String): Unit = {
    val spark = newDocs.sparkSession
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$table is not a bucketed signature store"))
    val w = Dedup.minhashSignatures(Dedup.shingleDocs(newDocs))
      .write.mode(SaveMode.Append)
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
        spec.bucketColumnNames.tail: _*)
    (if (spec.sortColumnNames.nonEmpty)
      w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    else w).saveAsTable(table)
  }
}
