package graft

import graft.functions.{Bloom, TextSim}
import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("no false negatives: every inserted gram is found") {
    val grams = (0 until 2000).map(i => s"gram value number $i").toDF("g")
    val f = Bloom.fit(grams, "g", mBits = 1 << 15, k = 5)
    // probe through BOTH paths: driver-side helper and the codegen'd
    // column expression (same static hash helpers by construction)
    (0 until 2000).foreach(i => assert(f.mightContain(s"gram value number $i")))
    val hits = grams.select(Bloom.hits(array(col("g")), f).as("h"))
      .agg(sum(col("h"))).as[Long].head()
    assert(hits == 2000L, "codegen probe must find every inserted gram")
  }

  test("false-positive rate bounded at 16x sizing") {
    val grams = (0 until 2000).map(i => s"gram value number $i").toDF("g")
    val f = Bloom.fit(grams, "g", mBits = 1 << 15, k = 5) // 16.4 bits/gram
    val fp = (0 until 10000).count(i => f.mightContain(s"absent gram $i"))
    assert(fp < 200, s"expected <2% false positives, got $fp / 10000")
  }

  test("bloom screen is a superset of the exact contamination pairs") {
    val docs = Tables.documents(spark, sf)
    val evalDocs = docs.filter(col("doc_id") % Corpus.EvalMod === 0)
    val trainDocs = docs.filter(col("doc_id") % Corpus.EvalMod =!= 0)
    val exact = Corpus.contamination(spark, sf)
      .select("train_id").distinct().as[Long].collect().toSet
    val screened = Corpus.contaminationBloom(trainDocs, evalDocs)
      .filter(col("flagged")).select("doc_id").as[Long].collect().toSet
    assert(exact.nonEmpty, "fixture must produce contaminated pairs")
    assert(exact.subsetOf(screened),
      s"exact hits missing from screen: ${exact -- screened}")
    // and the screen is a SCREEN, not a constant: most of the corpus
    // passes (the corpus vocabulary is tiny, so cross-hits are common;
    // still, the filter must separate)
    val total = trainDocs.filter(size(TextSim.tokens(col("text"))) >= 3).count()
    assert(screened.size < total, "screen must not flag everything")
  }

  test("probe plan is scan-shaped: no exchange, stays in codegen") {
    val docs = Tables.documents(spark, sf)
    val f = Bloom.fit(
      docs.limit(50).select(explode(TextSim.shingles3(
        TextSim.tokens(col("text")))).as("g")), "g", 1 << 15)
    val probed = docs
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), Bloom.hits(TextSim.shingles3(col("t")), f).as("h"))
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe must not shuffle:\n$plan")
    assert(probed.count() > 0)
    // the expression itself codegens (its HOF child doesn't — the
    // shingle transform is interpreted either way); over a plain array
    // column the probe stays inside WholeStageCodegen:
    val direct = docs.select(Bloom.hits(array(col("text")), f).as("h"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    assert(direct.queryExecution.executedPlan.toString
      .contains("*(1) Project [bloomhitsexpr"), "plain-array probe must codegen")
  }
}
