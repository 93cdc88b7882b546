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
}
