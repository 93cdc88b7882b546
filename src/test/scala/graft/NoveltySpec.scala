package graft

import graft.operators.{Corpus, Novelty}
import org.scalatest.funsuite.AnyFunSuite

class NoveltySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val M = Corpus.EvalMod.toLong

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    Novelty.novelty(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("eval_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_seen"),
          r.getAs[Long]("novelty_micro")))).toMap

  test("verbatim train copy scores novelty 0; disjoint doc scores 1e6") {
    val copied = "alpha beta gamma delta epsilon"
    val fresh = "zeta eta theta iota kappa"
    val r = run(Seq(
      (0L, copied),        // eval: every 3-gram is in train doc 1
      (M, fresh),          // eval: no 3-gram anywhere in train
      (1L, copied),
      (2L, "unrelated words entirely here now")))
    assert(r(0L) == ((3L, 3L, 0L)), s"copied doc must be 0-novel: $r")
    assert(r(M) == ((3L, 0L, 1000000L)), s"fresh doc must be fully novel: $r")
  }

  test("partial overlap counts DISTINCT grams, integer micro division") {
    // eval doc: tokens a b c d -> grams (a b c), (b c d); train has only (a b c)
    val r = run(Seq((0L, "a b c d"), (1L, "x a b c y")))
    assert(r(0L) == ((2L, 1L, 500000L)), s"half-novel expected: $r")
  }

  test("repeated gram in the eval doc counts once (distinct grain)") {
    // "a b c a b c a b c" yields grams {a b c, b c a, c a b} distinct
    val r = run(Seq((0L, "a b c a b c a b c"), (1L, "a b c")))
    assert(r(0L)._1 == 3L, s"distinct grams expected: $r")
    assert(r(0L)._2 == 1L, s"only (a b c) is in train: $r")
  }

  test("eval docs never see each other; short docs drop") {
    // two eval docs sharing all grams, no train doc has them
    val r = run(Seq((0L, "p q r s"), (2 * M, "p q r s"), (1L, "tiny one")))
    assert(r(0L)._3 == 1000000L && r(2 * M)._3 == 1000000L,
      s"eval-eval sharing must not reduce novelty: $r")
    assert(!r.contains(1L) && r.size == 2)
  }
}
