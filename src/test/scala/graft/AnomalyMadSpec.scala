package graft

import graft.operators.Events
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnomalyMadSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Events with counts(t) rows in hour t, one type. */
  private def evOf(counts: Seq[Int]): DataFrame =
    counts.zipWithIndex.flatMap { case (c, t) => Seq.fill(c)(t.toLong) }
      .toDF("t")
      .select(expr("timestamp_micros(t * 3600000000)").as("ts"),
        lit("x").as("event_type"))

  test("masking: one massive outlier hides a mild one from z, not from MAD") {
    // 46 calm hours at ~10, one mild anomaly (30), one massive (500).
    // The massive hour inflates the sample sd so far that the mild
    // hour's |z| < 2 (q_anomaly misses it); median/MAD don't move.
    val counts = Seq.tabulate(46)(i => 10 + (i % 3)) ++ Seq(30, 500)
    val ev = evOf(counts)
    val z = Events.anomaly(ev).collect()
      .map(r => r.getAs[Long]("n_events") -> r.getAs[Int]("is_anomaly")).toMap
    val m = Events.anomalyMad(ev).collect()
      .map(r => r.getAs[Long]("n_events") -> r.getAs[Int]("is_anomaly")).toMap
    assert(z(500L) == 1) // both see the elephant
    assert(m(500L) == 1)
    assert(z(30L) == 0, "z-screen must be MASKED by the 500 outlier here")
    assert(m(30L) == 1, "the robust screen must still flag 30 vs median ~11")
    assert(m(10L) == 0 && m(11L) == 0 && m(12L) == 0)
  }

  test("median and MAD are the exact order statistics; m rides the lattice") {
    // counts {4,6,6,8,100}: med = 6 (rank 3 of 5), devs {2,0,0,2,94}
    // sorted -> mad = rank-3 dev = 2; M(100) = 674500*94 div 2
    val got = Events.anomalyMad(evOf(Seq(4, 6, 6, 8, 100))).collect()
      .map(r => r.getAs[Long]("n_events") -> r).toMap
    assert(got(100L).getAs[Long]("med") == 6L)
    assert(got(100L).getAs[Long]("mad") == 2L)
    assert(got(100L).getAs[Long]("m_micro") == 674500L * 94L / 2L)
    assert(got(4L).getAs[Long]("m_micro") == -674500L) // (4-6)*674500 div 2
  }

  test("constant series: MAD = 0 reports NULL m and never flags") {
    val got = Events.anomalyMad(evOf(Seq.fill(10)(7))).collect()
    assert(got.forall(_.getAs[Long]("mad") == 0L))
    assert(got.forall(_.isNullAt(got.head.fieldIndex("m_micro"))))
    assert(got.forall(_.getAs[Int]("is_anomaly") == 0))
  }
}
