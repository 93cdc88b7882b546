package graft

import graft.operators.DpRelease
import org.scalatest.funsuite.AnyFunSuite

class DpTopKSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = "/root/testdata/sf0.001"

  test("top-k is pure post-processing of the q_dp_counts release (same seed)") {
    val full = DpRelease.dpCounts(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_released"))
    val expect = full.sortBy { case ((s, l), n) => (-n, s, l) }
      .take(DpRelease.TopKCells)
    val got = DpRelease.dpTopKQuery(spark, d).collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getAs[Long]("n_released")))
    // identical cells, identical noisy values, identical order — the
    // selection consumed zero additional budget by construction
    assert(got.toSeq == expect.toSeq)
  }

  test("ranks are 1..k and descending in noisy count with key tie-break") {
    val rows = DpRelease.dpTopKQuery(spark, d).collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to DpRelease.TopKCells))
    val ns = rows.map(_.getAs[Long]("n_released"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[Long]("eps_micro") == DpRelease.EpsMicro))
  }

  test("sticky noise: re-running the release returns identical rows") {
    val a = DpRelease.dpTopKQuery(spark, d).collect().map(_.toString)
    val b = DpRelease.dpTopKQuery(spark, d).collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }
}
