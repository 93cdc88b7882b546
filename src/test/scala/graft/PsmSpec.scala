package graft

import graft.operators.Psm
import org.scalatest.funsuite.AnyFunSuite

class PsmSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // (user_id, t, views, signups, y)
  private def run(users: Seq[(Long, Long, Long, Long, Long)]) =
    Psm.psmOf(users.toDF("user_id", "t", "views", "signups", "y"))
      .collect().head

  test("classic confounding: naive reads an effect, matched ATT is zero") {
    // stratum A (views=10): mostly treated, outcome 100 for EVERYONE
    // stratum B (views=0): mostly control, outcome 0 for EVERYONE
    // true effect is exactly 0; activity confounds the naive diff
    val a = (0L until 8L).map(u => (u, 1L, 10L, 0L, 100L)) ++
      (8L until 10L).map(u => (u, 0L, 10L, 0L, 100L))
    val b = (10L until 12L).map(u => (u, 1L, 0L, 0L, 0L)) ++
      (12L until 20L).map(u => (u, 0L, 0L, 0L, 0L))
    val r = run(a ++ b)
    assert(r.getAs[Long]("naive_micro") == 60000000L) // 80 - 20
    assert(r.getAs[Long]("att_micro") == 0L)          // within-stratum truth
    assert(r.getAs[Long]("n_matched") == 10L)
    assert(r.getAs[Long]("mean_gap_micro") == 0L)     // exact-score matches
  }

  test("off-support treated (all-treated cell) reported unmatched") {
    val matched = Seq((0L, 1L, 5L, 0L, 10L), (1L, 0L, 5L, 0L, 10L))
    // views=9 cell is 100% treated -> score 1e6, no control anywhere near
    val orphan = Seq((2L, 1L, 9L, 0L, 10L), (3L, 1L, 9L, 0L, 10L))
    val r = run(matched ++ orphan)
    assert(r.getAs[Long]("n_treated") == 3L)
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(r.getAs[Long]("n_unmatched") == 2L)
  }

  test("control pool at one score averages its outcomes") {
    // one treated (y=20) against two controls (y=10, y=30) in its cell
    val users = Seq((0L, 1L, 3L, 0L, 20L),
      (1L, 0L, 3L, 0L, 10L), (2L, 0L, 3L, 0L, 30L),
      // a far-away balanced stratum so scores differ from 0/1e6
      (3L, 1L, 7L, 0L, 5L), (4L, 0L, 7L, 0L, 5L))
    val r = run(users)
    // matched diffs: (20e6 - 20e6) and (5e6 - 5e6) -> ATT 0
    assert(r.getAs[Long]("att_micro") == 0L)
    assert(r.getAs[Long]("n_matched") == 2L)
  }

  test("a real effect survives the adjustment") {
    // same confounded strata, but treatment ADDS exactly 7 everywhere
    val a = (0L until 8L).map(u => (u, 1L, 10L, 0L, 107L)) ++
      (8L until 10L).map(u => (u, 0L, 10L, 0L, 100L))
    val b = (10L until 12L).map(u => (u, 1L, 0L, 0L, 7L)) ++
      (12L until 20L).map(u => (u, 0L, 0L, 0L, 0L))
    val r = run(a ++ b)
    assert(r.getAs[Long]("att_micro") == 7000000L)
  }
}
