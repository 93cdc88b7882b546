package graft

import graft.operators.Gini
import org.scalatest.funsuite.AnyFunSuite

class GiniSpec extends AnyFunSuite {
  import SparkTestSession._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Textbook sorted-rank Gini on raw values. */
  private def bruteGini(xs: Seq[Long]): Double = {
    val s = xs.sorted
    val n = s.length.toLong
    val sx = s.sum
    val sr = s.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    r6((2L * sr - (n + 1) * sx).toDouble / (n.toDouble * sx.toDouble))
  }

  test("uniform mass scores 0; a single giant drives G toward 1; ties are unambiguous") {
    assert(bruteGini(Seq.fill(10)(7L)) == 0.0)
    assert(bruteGini(Seq.fill(99)(1L) :+ 10000L) > 0.9)
    // tie blocks: any permutation of equal values gives the same G —
    // the value-grid fold computes exactly this
    assert(bruteGini(Seq(5L, 5L, 5L, 20L)) == bruteGini(Seq(20L, 5L, 5L, 5L)))
  }

  test("value-grid fold matches the textbook sorted-rank Gini on the corpus") {
    val got = Gini.giniQuery(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    val docs = Tables.documents(spark, sf)
      .selectExpr("source",
        "cast(size(filter(split(text, ' '), x -> x != '')) as long) as toks")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 >= 1)
    for ((src, grp) <- docs.groupBy(_._1)) {
      val xs = grp.map(_._2).toSeq
      assert(got(src) == ((xs.length.toLong, bruteGini(xs))), src)
    }
  }
}
