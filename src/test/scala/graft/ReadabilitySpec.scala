package graft

import graft.operators.Readability
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReadabilitySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("hand-computed FRE/ARI on a tiny doc") {
    // "go up he is at it" — 6 words, 6 vowel runs (o,u,e,i,a,i),
    // 1 pseudo-sentence (6 <= 15), 12 non-space chars
    val docs = Seq((1L, "go up he is at it")).toDF("doc_id", "text")
    val r = Readability.readability(docs)
      .select(col("n_words"), col("n_syll"), col("n_sents"), col("fre"), col("ari"))
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._1 == 6 && r._2 == 6 && r._3 == 1)
    assert(r._4 == r6(206.835 - 1.015 * 6.0 - 84.6 * 1.0))
    assert(r._5 == r6(4.71 * (12.0 / 6.0) + 0.5 * 6.0 - 21.43))
  }

  test("pseudo-sentence rule: ceil(words/15)") {
    val docs = Seq(
      (1L, Seq.fill(15)("it").mkString(" ")),
      (2L, Seq.fill(16)("it").mkString(" ")),
      (3L, Seq.fill(30)("it").mkString(" "))).toDF("doc_id", "text")
    val m = Readability.readability(docs)
      .select(col("doc_id"), col("n_sents")).as[(Long, Long)].collect().toMap
    assert(m == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("band thresholds honour the rounded score") {
    // many-syllable words push FRE down; monosyllables push it up
    val docs = Seq(
      (1L, "go up he is at it on my we do"),
      (2L, "organizational responsibilities internationalization")).toDF("doc_id", "text")
    val m = Readability.readability(docs)
      .select(col("doc_id"), col("fre"), col("band"))
      .as[(Long, Double, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L)._1 > m(2L)._1)
    def bandOf(f: Double): String =
      if (f >= 70) "easy" else if (f >= 50) "standard"
      else if (f >= 30) "difficult" else "hard"
    m.values.foreach { case (f, b) => assert(b == bandOf(f)) }
  }

  test("corpus query: every doc scored, no shuffle in the per-doc plan") {
    val out = Readability.readability(Tables.documents(spark, sf))
    val n = Tables.documents(spark, sf).count()
    assert(out.count() == n)
    // pure per-row projection: no Exchange anywhere
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "readability must be a scan-shaped projection")
  }
}
