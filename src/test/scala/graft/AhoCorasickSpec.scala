package graft

import graft.functions.{AhoCorasick, AhoCorasickCountsExpr}
import graft.operators.MultiMatch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AhoCorasickSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Sequential reference: all (overlapping) occurrences of p in t. */
  private def bruteCount(t: String, p: String): Long = {
    var n = 0L
    var i = t.indexOf(p)
    while (i >= 0) { n += 1; i = t.indexOf(p, i + 1) }
    n
  }

  test("counts match the brute per-pattern recount on random word texts") {
    val vocab = Array("table", "scan", "fast", "merge", "batch", "part", "a")
    val rnd = new scala.util.Random(7)
    val texts = (1L to 40L).map { id =>
      id -> Array.fill(rnd.nextInt(60) + 1)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    val got = texts.toDF("doc_id", "text")
      .select(col("doc_id"), AhoCorasick(col("text"), MultiMatch.Terms).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((id, text) <- texts; (p, i) <- MultiMatch.Terms.zipWithIndex)
      assert(got(id)(i) == bruteCount(text, p),
        s"doc $id pattern '$p': got ${got(id)(i)}, want ${bruteCount(text, p)}")
  }

  test("nested patterns both fire: fail-chain output emits the shorter") {
    val t = "table table table"
    val c = Seq(1L -> t).toDF("doc_id", "text")
      .select(AhoCorasick(col("text"), MultiMatch.Terms).as("c"))
      .as[Seq[Long]].head()
    val idx = MultiMatch.Terms.zipWithIndex.toMap
    assert(c(idx("table")) == 3, "inner pattern must fire inside the outer")
    assert(c(idx("table table")) == 2, "overlapping outer occurrences both count")
  }

  test("foreign chars reset to root; a match never spans one") {
    val c = Seq(1L -> "taXble table").toDF("doc_id", "text")
      .select(AhoCorasick(col("text"), Seq("table")).as("c"))
      .as[Seq[Long]].head()
    assert(c.head == 1)
  }

  test("cost is dictionary-size independent: automaton is one reference object") {
    // structural sanity of the scale claim: doubling the dictionary
    // does not change the per-char transition count (one delta lookup),
    // only the emit lists — asserted via the automaton shape
    val small = AhoCorasick.build(Array("ab", "cd"))
    val big = AhoCorasick.build(Array("ab", "cd", "ef", "gh", "ij", "kl"))
    assert(small.sigma <= big.sigma && big.delta.length > small.delta.length)
    assert(big.counts("ab cd ef").count(_ > 0) == 3)
  }

  test("by-value semanticEquals across instances (ExprEq)") {
    // literal child, not col(): a Column wraps a fresh Origin per call
    // site, which is never value-equal — the property under test is
    // the PATTERN ARRAY comparison (see ExprEqSpec)
    val child = org.apache.spark.sql.catalyst.expressions.Literal
      .create("xy", org.apache.spark.sql.types.StringType)
    val a = AhoCorasickCountsExpr(child, Array("x", "y"))
    val b = AhoCorasickCountsExpr(child, Array("x", "y"))
    val c = AhoCorasickCountsExpr(child, Array("x", "z"))
    assert(a.semanticEquals(b) && a.hashCode == b.hashCode)
    assert(!a.semanticEquals(c))
  }

  test("q_multimatch rides the scan: no Exchange before the final sort") {
    val plan = MultiMatch.matches(Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "multimatch must be a scan projection + bounded explode")
  }

  test("q_multimatch is non-degenerate on the corpus") {
    val out = MultiMatch.multiMatch(spark, sf)
    val terms = out.select(col("term")).distinct().as[String].collect().toSet
    assert(terms.contains("table") && terms.size >= 3,
      s"expected several dictionary terms to match, got $terms")
  }
}
