package graft

import graft.operators.Relevance
import org.scalatest.funsuite.AnyFunSuite

class RankCorrSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(vec: Seq[(Long, Long, Long)], lex: Seq[(Long, Long, Long)]) =
    Relevance.spearmanOf(
      vec.toDF("query_id", "vec_id", "v_rank"),
      lex.toDF("query_id", "vec_id", "l_rank")).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_common"),
          Option(r.get(r.fieldIndex("rho"))).map(_.asInstanceOf[Double]))))
      .toMap

  test("identical orderings give rho 1, reversed give -1") {
    val vec = (1L to 5L).map(i => (1L, 100L + i, i)) ++
      (1L to 5L).map(i => (2L, 100L + i, i))
    val lex = (1L to 5L).map(i => (1L, 100L + i, i)) ++
      (1L to 5L).map(i => (2L, 100L + i, 6L - i))
    val r = run(vec, lex)
    assert(r(1L) == ((5L, Some(1.0))))
    assert(r(2L) == ((5L, Some(-1.0))))
  }

  test("textbook partial agreement and the n<2 NULL guard") {
    // permutation (1,2,3,4)->(2,1,4,3): d^2 = 1+1+1+1 = 4,
    // rho = 1 - 24/(4*15) = 0.6
    val vec = (1L to 4L).map(i => (1L, 10L + i, i)) :+ (9L, 99L, 1L)
    val lex = Seq((1L, 11L, 2L), (1L, 12L, 1L), (1L, 13L, 4L),
      (1L, 14L, 3L), (9L, 99L, 1L))
    val r = run(vec, lex)
    assert(r(1L) == ((4L, Some(0.6))))
    assert(r(9L) == ((1L, None)), "single common doc has no rho")
  }

  test("only the intersection is ranked: disjoint tails cannot skew rho") {
    // common docs {11,12} ordered the same way; each arm also ranks
    // docs the other never saw
    val vec = Seq((1L, 11L, 1L), (1L, 12L, 5L), (1L, 50L, 2L), (1L, 51L, 3L))
    val lex = Seq((1L, 11L, 2L), (1L, 12L, 9L), (1L, 70L, 1L))
    val r = run(vec, lex)
    assert(r(1L) == ((2L, Some(1.0))))
  }
}
