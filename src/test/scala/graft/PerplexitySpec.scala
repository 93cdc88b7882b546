package graft

import graft.operators.{Corpus, Perplexity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PerplexitySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("word salad scores higher cross-entropy than reference-like prose") {
    val m = Corpus.EvalMod.toLong
    // reference slice (ids ≡ 0 mod EvalMod): repetitive clean prose —
    // the LM learns its bigrams
    val refDocs = (1 to 6).map(i =>
      (i * m, "the quick brown fox jumps over the lazy dog and runs home"))
    // scored docs: one echoing the reference phrasing, one shuffled
    // into bigram salad from the SAME vocabulary (unigram mix equal —
    // exactly what a sequential model separates and a feature mix
    // cannot), one from an unseen vocabulary
    val fluent = (1L, "the quick brown fox jumps over the lazy dog")
    val salad = (2L, "dog the over quick lazy jumps fox brown the")
    val alien = (3L, "zyx wvu tsr qpo nml kji hgf edc ba")
    val out = Perplexity.score(
      (refDocs :+ fluent :+ salad :+ alien).toDF("doc_id", "text"))
      .select(col("doc_id"), col("xent")).as[(Long, Double)]
      .collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L), "reference docs must not be scored")
    assert(out(1L) < out(2L),
      s"fluent ${out(1L)} must beat same-vocab salad ${out(2L)}")
    assert(out(1L) < out(3L),
      s"fluent ${out(1L)} must beat unseen-vocab ${out(3L)}")
    // every alien gram is unseen-context + unseen-bigram: its exact
    // cross-entropy is ln(B2) per gram — pinned to the r6 rounding.
    // (Salad may score slightly ABOVE this: seen contexts inflate the
    // denominator while its bigrams stay unseen — correct behavior.)
    assert(out(3L) == 6.931472, s"alien doc must score ln(1024), got ${out(3L)}")
  }

  test("merged batch counts equal one-shot counts — any order, bit-exact scores") {
    val docs = Tables.documents(spark, sf).limit(400)
    val ref = docs.filter(col("doc_id") % Corpus.EvalMod === 0)
    val a = ref.filter(col("doc_id") % 2 === 0)
    val b = ref.filter(col("doc_id") % 2 === 1)
    val merged = Perplexity.mergeCounts(
      Perplexity.refCounts(b), Perplexity.refCounts(a))
    val oneShot = Perplexity.refCounts(ref)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.as[(Int, Long, Long)].collect().toSet
    assert(key(merged) == key(oneShot),
      "batch counts must merge by addition to the one-shot table")
    // and the tables — hence every downstream score — are bit-equal
    val (m1, m2) = Perplexity.lambdaTables(merged)
    val (o1, o2) = Perplexity.lambdaTables(oneShot)
    assert(m1.sameElements(o1) && m2.sameElements(o2))
  }

  test("streaming scorer is bit-equal to the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.documents(spark, sf).limit(300)
    val (lam1, lam2) = Perplexity.lambdaTables(
      Perplexity.refCounts(docs.filter(col("doc_id") % Corpus.EvalMod === 0)))
    val scored = docs.filter(col("doc_id") % Corpus.EvalMod =!= 0)
    val want = Perplexity.scoreWith(scored, lam1, lam2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val rows = scored.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingPerplexity(
      mem.toDF().toDF("doc_id", "text"), lam1, lam2)
      .writeStream.format("memory").queryName("ppl_t")
      .outputMode("append").start()
    try {
      val (h, t) = rows.splitAt(rows.length / 2)
      mem.addData(h.toSeq); q.processAllAvailable()
      mem.addData(t.toSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ppl_t")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want, "stream scores must be bit-equal to batch")
  }

  test("score is a per-row fold: the corpus never shuffles") {
    val docs = Tables.documents(spark, sf)
    val plan = Perplexity.score(docs).queryExecution.executedPlan.toString
    // the ONLY exchanges belong to the two bounded calibration aggs
    // (already collected before this plan exists) — scoring itself is
    // scan → filter → project
    assert(!plan.contains("Exchange"),
      s"scoring must ride the scan, not shuffle:\n$plan")
  }
}
