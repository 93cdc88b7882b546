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
