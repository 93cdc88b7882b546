package graft

import graft.operators.{Cdc, Etl}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CDC payoff test: content-defined chunk identities minimize
  * re-embedding under document edits — the incremental contract the
  * reference enforces at FILE granularity (skip unchanged sources,
  * re-upload changed ones whole) pushed down to CHUNK granularity:
  * an edited document re-embeds only the chunks the edit actually
  * touched.
  */
class CdcUpsertSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("prepend edit: CDC re-embeds a fraction of what position-based chunking does") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 100).limit(200).cache()
    val edited = docs.withColumn("text",
      when(col("doc_id") % 10 === 0,
        concat(lit("breaking update prepended to this document "), col("text")))
        .otherwise(col("text")))
    val nEdited = docs.filter(col("doc_id") % 10 === 0).count()
    assert(nEdited > 0)

    // "store" = set of chunk-content identities already embedded (v1)
    val cdcV1 = Cdc.chunks(docs).select("chunk_hash").distinct()
    val cdcDelta = Cdc.chunks(edited).select("chunk_hash").distinct()
      .except(cdcV1).count()

    // position-based contrast: the greedy reference chunker re-keys
    // every chunk of an edited doc (all boundaries shift)
    def greedyHashes(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        posexplode(Etl.chunkTokens(col("text"), 200)).as(Seq("i", "c")))
        .select(md5(col("c")).as("chunk_hash")).distinct()
    val greedyDelta = greedyHashes(edited).except(greedyHashes(docs)).count()

    // CDC: the prepend perturbs only text before the first cut word ->
    // about one new chunk per edited doc; greedy re-keys most chunks
    assert(cdcDelta <= 2 * nEdited,
      s"cdc delta $cdcDelta should be ~1 chunk per edited doc ($nEdited)")
    assert(cdcDelta < greedyDelta,
      s"cdc delta $cdcDelta must beat position-based delta $greedyDelta")
    // and the edit is invisible to every untouched doc
    assert(Cdc.chunks(docs.filter(col("doc_id") % 10 =!= 0))
      .select("chunk_hash").except(cdcV1).count() == 0)
  }
}
