package graft

import graft.operators.CaptureRecapture
import org.scalatest.funsuite.AnyFunSuite

class CaptureRecaptureSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def pairs(ps: Seq[(Long, Long)]) = ps.toDF("a_id", "b_id")

  test("hand Chapman: n1=10 n2=8 m=4 -> total 18, missed 4") {
    val c1 = pairs((0L until 10L).map(i => (i, i + 100L)))
    val c2 = pairs((0L until 4L).map(i => (i, i + 100L)) ++
      (0L until 4L).map(i => (i + 50L, i + 200L)))
    val r = CaptureRecapture.capOf(c1, c2).collect().head
    assert(r.getAs[Long]("n_both") == 4L)
    assert(r.getAs[Long]("chapman_total") == 11L * 9L / 5L - 1L)
    assert(r.getAs[Long]("n_union") == 14L)
    assert(r.getAs[Long]("est_missed") == 18L - 14L)
  }

  test("identical catches: estimate equals the seen count, missed 0") {
    val c = pairs((0L until 7L).map(i => (i, i + 10L)))
    val r = CaptureRecapture.capOf(c, c).collect().head
    assert(r.getAs[Long]("chapman_total") == 7L)
    assert(r.getAs[Long]("est_missed") == 0L)
    assert(r.getAs[Long]("cov_minhash_micro") == 1000000L)
  }

  test("disjoint catches: little overlap means many unseen dups") {
    val c1 = pairs((0L until 6L).map(i => (i, i + 10L)))
    val c2 = pairs((0L until 6L).map(i => (i + 20L, i + 30L)))
    val r = CaptureRecapture.capOf(c1, c2).collect().head
    // m=0: Chapman (7*7)/1 - 1 = 48 against a union of 12
    assert(r.getAs[Long]("chapman_total") == 48L)
    assert(r.getAs[Long]("est_missed") == 36L)
    assert(r.getAs[Long]("cov_minhash_micro") == 0L)
  }
}
