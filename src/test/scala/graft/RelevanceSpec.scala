package graft

import graft.operators.Relevance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelevanceSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("batch bm25 stats merge by addition and score identically to one-shot") {
    val docs = Tables.documents(spark, sf)
    val batches = Seq(0, 1, 2).map(r => docs.filter(col("doc_id") % 3 === r))
    val merged = batches.map(Relevance.bm25Stats).reduce(Relevance.mergeBm25Stats)
    val oneShot = Relevance.bm25Stats(docs)
    assert(merged.collect().toSeq == oneShot.collect().toSeq,
      "merged stats must equal one-shot stats")
    // reversed merge order too (addition commutes)
    val mergedRev = batches.reverse.map(Relevance.bm25Stats)
      .reduce(Relevance.mergeBm25Stats)
    assert(mergedRev.collect().toSeq == oneShot.collect().toSeq)

    val a = Relevance.bm25Score(docs, merged)
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = Relevance.bm25Score(docs, oneShot)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b, "scores under merged calibration must be bit-identical")
    assert(a.nonEmpty && a.exists(_._4 > 0))
  }

  test("hybrid served from the stored index tracks the brute-arm hybrid") {
    import graft.sources.IndexStore
    val docs = Tables.documents(spark, sf)
    val vecs = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val queries = vecs.filter(col("vec_id") % 100 === 0)
    val dir = java.nio.file.Files.createTempDirectory("hybrid_idx_").toString
    IndexStore.build(vecs, dir, 64, nlist = 8)
    val served = Relevance.hybridServed(spark, docs, vecs, queries,
      IndexStore.open(spark, dir), nprobe = 8) // full probe
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._3).toSet }
    val brute = Relevance.hybrid(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._3).toSet }
    assert(served.keySet == brute.keySet)
    // full probing + 3x shortlist + exact rerank: the fused pages must
    // agree almost everywhere (ADC only orders the SHORTLIST cut; a
    // true top-30 member falling out of the 90-deep ADC list is rare)
    val overlaps = brute.map { case (q, ids) =>
      (served(q) & ids).size.toDouble / ids.size }
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.8, s"served hybrid diverged: mean page overlap $mean")
  }
}
