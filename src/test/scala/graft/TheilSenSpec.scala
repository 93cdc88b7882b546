package graft

import graft.operators.TheilSen
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TheilSenSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def evOf(counts: Seq[Int]): DataFrame =
    counts.zipWithIndex.flatMap { case (c, t) => Seq.fill(c)(t.toLong) }
      .toDF("t")
      .select(expr("timestamp_micros(t * 3600000000)").as("ts"),
        lit("x").as("event_type"))

  test("one corrupted hour bends OLS but not the median slope") {
    // clean trend y = 2t + 3 over 20 hours, hour 5 replayed to 400
    val counts = Seq.tabulate(20)(t => if (t == 5) 400 else 2 * t + 3)
    val r = TheilSen.theilSen(evOf(counts)).collect().head
    // most pairwise slopes are exactly 2; pairs through the corrupted
    // hour are 19 of 190 — the median is the CLEAN trend, exactly
    assert(r.getAs[Long]("slope_micro") == 2000000L)
    assert(r.getAs[String]("direction") == "rising")
    assert(r.getAs[Long]("n_pairs") == 190L)
    // OLS on the same cells, for contrast: the outlier drags it
    val n = 20.0
    val st = (0 until 20).sum.toDouble
    val stt = (0 until 20).map(t => t * t).sum.toDouble
    val sy = counts.map(_.toDouble).sum
    val sty = counts.zipWithIndex.map { case (y, t) => y.toDouble * t }.sum
    val ols = (n * sty - st * sy) / (n * stt - st * st)
    assert(math.abs(ols - 2.0) > 0.5, s"OLS should bend, got $ols")
  }

  test("exact lattice median on a hand-built series") {
    // y = {1, 11, 1} (nonzero edges keep the observed span at 3
    // hours): slopes (t0,t1)=10e6, (t1,t2)=-10e6, (t0,t2)=0;
    // sorted {-10e6, 0, 10e6}, median = 0 -> flat
    val r = TheilSen.theilSen(evOf(Seq(1, 11, 1))).collect().head
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("slope_micro") == 0L)
    assert(r.getAs[String]("direction") == "flat")
  }

  test("falling series reports a negative lattice slope") {
    val r = TheilSen.theilSen(evOf(Seq(9, 6, 3, 0))).collect().head
    assert(r.getAs[Long]("slope_micro") == -3000000L)
    assert(r.getAs[String]("direction") == "falling")
  }
}
