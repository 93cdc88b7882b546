package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("chunks are lossless and boundaries are content-defined") {
    val docs = Tables.documents(spark, sf).limit(50)
    val back = Cdc.chunks(docs)
      .groupBy("doc_id")
      .agg(concat_ws(" ", collect_list(col("chunk_text"))).as("re"))
    // collect_list is ordered within a doc here because chunks of one
    // doc come from ONE posexplode row (no shuffle between), but sort
    // explicitly to be order-robust:
    val re = Cdc.chunks(docs).orderBy("doc_id", "chunk_index")
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).mkString(" ") }
    val orig = docs.select(col("doc_id"),
      concat_ws(" ", graft.functions.TextSim.tokens(col("text"))).as("t"))
      .as[(Long, String)].collect().toMap
    orig.foreach { case (id, t) =>
      assert(re(id) == t, s"doc $id reassembly mismatch")
    }
    assert(back.count() == docs.count())
  }

  test("shift resistance: a prepended prefix leaves every chunk after the first cut intact") {
    val docs = Tables.documents(spark, sf).limit(100)
      .select(col("doc_id"), col("text"))
    val prefixed = docs.select(col("doc_id"),
      concat(lit("freshly prepended noise words here "), col("text")).as("text"))
    val a = Cdc.chunks(docs).select("doc_id", "chunk_index", "chunk_text")
      .as[(Long, Long, String)].collect().groupBy(_._1)
    val b = Cdc.chunks(prefixed).select("doc_id", "chunk_text")
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    var preserved = 0L; var total = 0L
    a.foreach { case (id, chunksA) =>
      // every chunk except the first is reproduced verbatim in the
      // prefixed doc (the prefix only perturbs text up to the first cut)
      val tail = chunksA.sortBy(_._2).drop(1).map(_._3)
      total += tail.length
      preserved += tail.count(b(id).contains)
      assert(tail.forall(b(id).contains),
        s"doc $id lost post-cut chunks under a prefix edit")
    }
    assert(total > 0, "fixture must produce multi-chunk docs")
    // contrast: the reference-style greedy chunker re-chunks everything
    // (first boundary moves -> all downstream boundaries move)
  }

  test("cdc dedup finds the shared prefix chunks of edited near-copies") {
    val dups = Cdc.cdcDedup(spark, sf)
    // every injected near-copy (doc_id + 2000000, suffix appended)
    // shares all but its final chunk with its source doc
    val crossDoc = dups.filter(col("n_docs") >= 2).count()
    assert(crossDoc > 0, "no cross-doc duplicated chunks found")
    // and chunking is per-row: the chunks() plan has no Exchange
    val plan = Cdc.chunks(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
