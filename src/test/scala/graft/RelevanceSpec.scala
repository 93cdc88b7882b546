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
}
