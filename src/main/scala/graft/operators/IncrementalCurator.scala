package graft.operators

import graft.sources.SignatureStore
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The incremental curation loop composed END-TO-END — the r7 gap:
  * every piece existed and was parity-tested in isolation
  * ([[graft.sources.SignatureStore.incrementalPairs]] for delta
  * pairs, [[Components.mergePairs]] for label maintenance,
  * [[Dedup.keepFromLabels]] for the survivor last mile) but nothing
  * ran ingest-batch → signature-append → label-merge → keeper-refresh
  * as one operation the way [[IncrementalRunner]] does for the
  * reference ETL surface (reference analogue: `run_etl`'s
  * manifest-driven incremental contract,
  * Notion_openai_vector_etl.py:617-779 — the batch frame here is
  * exactly what [[Etl.manifestDelta]] classifies as needing work).
  *
  * State is two catalog tables, both storage-backed so a weekly run
  * survives the session: the bucketed signature store (the identity
  * authority — ids must be new to [[ingest]], its contract) and the
  * label table (the CC fixpoint over every pair ever observed, pair
  * members only — the isolated majority never occupies a row).
  *
  * The cost shape that matters at 100 TB: one ingested batch computes
  * batch-sized signatures, joins new bands BROADCAST against the
  * stored band table (no stored-side shuffle), merges delta pairs
  * into labels over the label-CONTRACTED graph (bounded by 2·|batch
  * pairs|, never the corpus — [[Components.mergePairs]]), and the
  * keeper refresh is one left join. Nothing old×old is ever
  * recomputed; the rehearsal stage (`curator_delta` vs
  * `curator_full`) measures the gap at 4×/10× replication.
  * IncrementalCuratorSpec asserts the COMPOSITION's fixpoint: after
  * any batch schedule, [[curated]] ≡ the full one-shot recompute,
  * row for row.
  */
object IncrementalCurator {

  /** Bootstrap the curator from the first corpus batch: build the
    * signature store, derive its pairs, store the CC fixpoint.
    */
  def init(spark: SparkSession, docs: DataFrame, sigTable: String,
    labelTable: String): Unit = {
    SignatureStore.build(docs, sigTable)
    val pairs = SignatureStore.pairs(spark, sigTable)
      .select(col("a_id"), col("b_id"))
    Components.fromPairs(pairs)
      .write.mode(SaveMode.Overwrite).saveAsTable(labelTable)
  }

  /** Ingest one batch end-to-end: delta pairs (new×new + new×old,
    * stored side never shuffled) → label merge over the contracted
    * delta graph → label-table swap → signature append. The pair
    * frame is MATERIALIZED before the append: `incrementalPairs`
    * reads the store lazily, and appending first would violate its
    * ids-must-be-new contract mid-plan.
    */
  def ingest(spark: SparkSession, newDocs: DataFrame, sigTable: String,
    labelTable: String): Unit = {
    // ONE shingle+minhash pass for the whole ingest: the signature
    // frame is the dominant batch-side cost and both the pair
    // derivation and the append need it
    val newSig = Dedup.minhashSignatures(Dedup.shingleDocs(newDocs))
      .localCheckpoint()
    val pairs = SignatureStore.incrementalPairsFrom(spark, newSig, sigTable)
      .select(col("a_id"), col("b_id")).localCheckpoint()
    val merged = Components.mergePairs(spark.table(labelTable), pairs)
      .localCheckpoint()
    // swap, not in-place overwrite: the crash-safe table-replace
    // discipline of SignatureStore.compactTombstones
    merged.write.mode(SaveMode.Overwrite).saveAsTable(s"${labelTable}_next")
    spark.sql(s"DROP TABLE $labelTable")
    spark.sql(s"ALTER TABLE ${labelTable}_next RENAME TO $labelTable")
    SignatureStore.appendSignatures(newSig, newDocs, sigTable)
  }

  /** Keeper refresh — the curated corpus over everything ingested so
    * far: every live doc id labeled with its cluster's keeper via one
    * left join against the maintained labels (no pair recompute, no
    * iteration). `filter(is_kept)` is the training set.
    */
  def curated(spark: SparkSession, sigTable: String,
    labelTable: String): DataFrame =
    Dedup.keepFromLabels(
      SignatureStore.liveSignatures(spark, sigTable)
        .select(col("doc_id")).distinct(),
      spark.table(labelTable))
}
