package graft

import graft.operators.Relevance
import graft.sources.PostingsStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PostingsStoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val dir =
    java.nio.file.Files.createTempDirectory("postings_").toString

  test("stored-index search matches the one-pass bm25 on the fixed term set") {
    val docs = Tables.documents(spark, sf)
    PostingsStore.build(docs, dir)
    val got = PostingsStore.search(spark, dir, Relevance.Terms, k = 20)
      .as[(Long, Long, Double)].collect()
    val want = Relevance.bm25(spark, sf)
      .filter(col("bm25") > 0)
      .select(col("doc_id"), col("matched"), col("bm25"))
      .as[(Long, Long, Double)].collect()
      .sortBy(r => (-r._3, r._1)).take(20)
    assert(got.map(_._1).toSeq == want.map(_._1).toSeq,
      "stored search must rank the same page as the one-pass bm25")
    got.zip(want).foreach { case ((d, m, s), (_, mw, sw)) =>
      assert(m == mw, s"matched-term count diverged for doc $d")
      // both sides round-6; only the per-doc ADDITION ORDER differs
      // (fixed column fold vs groupBy row order) — last-ulp only
      assert(math.abs(s - sw) <= 2e-6, s"score diverged for doc $d: $s vs $sw")
    }
  }

  test("query reads are partition-pruned to the terms' buckets") {
    val plan = PostingsStore.search(spark, dir, Seq("spark", "query"))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bkt".r.findFirstIn(plan).isDefined,
      s"bucket filter must prune partitions:\n$plan")
  }

  test("append-built store searches identically to a one-shot build") {
    val docs = Tables.documents(spark, sf)
    val dirInc = java.nio.file.Files.createTempDirectory("postings_inc_").toString
    PostingsStore.build(docs.filter(col("doc_id") % 2 === 0), dirInc)
    PostingsStore.append(docs.filter(col("doc_id") % 2 === 1), dirInc)
    val inc = PostingsStore.search(spark, dirInc, Relevance.Terms, k = 20)
      .as[(Long, Long, Double)].collect()
    val full = PostingsStore.search(spark, dir, Relevance.Terms, k = 20)
      .as[(Long, Long, Double)].collect()
    assert(inc.map(r => (r._1, r._2)).toSeq == full.map(r => (r._1, r._2)).toSeq,
      "append-built ranking must equal the one-shot build")
    inc.zip(full).foreach { case ((d, _, s), (_, _, sw)) =>
      assert(math.abs(s - sw) <= 2e-6, s"score diverged for doc $d after append")
    }
  }

  test("streaming ingest searches identically to batch append") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, sf)
    val dirS = java.nio.file.Files.createTempDirectory("postings_str_").toString
    PostingsStore.build(docs.filter(col("doc_id") % 2 === 0), dirS)
    val rows = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (m1, m2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingPostingsIngest.ingest(
      mem.toDF().toDF("doc_id", "text"), dirS)
    try {
      mem.addData(m1.toSeq); q.processAllAvailable()
      mem.addData(m2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = PostingsStore.search(spark, dirS, Relevance.Terms, k = 20)
      .as[(Long, Long, Double)].collect()
    val full = PostingsStore.search(spark, dir, Relevance.Terms, k = 20)
      .as[(Long, Long, Double)].collect()
    assert(streamed.map(r => (r._1, r._2)).toSeq ==
      full.map(r => (r._1, r._2)).toSeq)
    streamed.zip(full).foreach { case ((d, _, s), (_, _, sw)) =>
      assert(math.abs(s - sw) <= 2e-6, s"score diverged for doc $d via stream")
    }
  }

  test("terms absent from the corpus score nothing and break nothing") {
    assert(PostingsStore.search(spark, dir, Seq("zzznotaword")).count() == 0)
    // and a mixed query is unaffected by the dead term
    val mixed = PostingsStore.search(spark, dir, Seq("spark", "zzznotaword"), k = 5)
      .as[(Long, Long, Double)].collect()
    val clean = PostingsStore.search(spark, dir, Seq("spark"), k = 5)
      .as[(Long, Long, Double)].collect()
    assert(mixed.toSeq == clean.toSeq)
  }
}
