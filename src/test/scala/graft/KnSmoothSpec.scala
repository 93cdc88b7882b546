package graft

import graft.operators.KnSmooth
import org.scalatest.funsuite.AnyFunSuite

class KnSmoothSpec extends AnyFunSuite {
  import SparkTestSession._

  test("the micro algebra is the interpolated-KN closed form") {
    val rows = KnSmooth.knSmooth(spark, sf).collect()
    assert(rows.length == KnSmooth.TopK)
    rows.foreach { r =>
      val (c12, c1, n1, nc) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // recompute ntot-free check via the exact rational identity:
      // p = (max(4c12-3,0)·N + 3·n1·nc) / (4·c1·N) — verify against
      // BigInt arithmetic using N recovered from one row's numbers is
      // impossible; instead assert the two bounding terms
      val discounted = BigInt(math.max(4 * c12 - 3, 0L)) * 1000000 / (4 * c1)
      assert(BigInt(r.getLong(6)) >= discounted - 1,
        "KN prob is at least the discounted MLE term")
      assert(r.getLong(6) <= 1000000L, "a probability stays ≤ 1")
    }
    // ordering contract
    val ps = rows.map(_.getLong(6)).toSeq
    assert(ps == ps.sorted.reverse)
  }

  test("closed-form hand corpus: discounting and continuation mass") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus: "a b", "a b", "a c" → c(a·)=3, bigrams ab:2 ac:1
    // N1+(a·)=2, N1+(·b)=1, N1+(·c)=1, N1+(··)=2
    // P(b|a) = (2-.75)/3 + .75·2/3 · 1/2 = 1.25/3 + .25 = 2/3
    // P(c|a) = (1-.75)/3 + .25 = 1/3  (sums to 1: no unseen w2 here)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("kn_docs")
    val toks = docs.select(graft.functions.TextSim.tokens(col("text")).as("t"))
    // drive the same arithmetic by hand
    def pMicro(c12: Long, c1: Long, n1: Long, nc: Long, n: Long): Long =
      ((BigInt(math.max(4 * c12 - 3, 0L)) * n + BigInt(3 * n1) * nc) * 1000000 /
        (BigInt(4 * c1) * n)).toLong
    assert(pMicro(2, 3, 2, 1, 2) == 666666L) // P(b|a) = 2/3
    assert(pMicro(1, 3, 2, 1, 2) == 333333L) // P(c|a) = 1/3
    assert(pMicro(2, 3, 2, 1, 2) + pMicro(1, 3, 2, 1, 2) <= 1000000L)
    assert(toks.count() == 3)
  }
}
