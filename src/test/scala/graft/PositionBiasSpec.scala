package graft

import graft.operators.{Assortativity, PositionBias}
import org.scalatest.funsuite.AnyFunSuite

class PositionBiasSpec extends AnyFunSuite {
  import SparkTestSession._

  test("positions tile sessions: counts telescope, COEC centers on 1") {
    val rows = PositionBias.positionBias(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty && rows.head.getLong(0) == 1L)
    // position p+1 can never have more events than position p (every
    // session with a (p+1)th event has a pth)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        if (b.getLong(0) < PositionBias.MaxPos)
          assert(b.getLong(1) <= a.getLong(1),
            s"position ${b.getLong(0)} outnumbers ${a.getLong(0)}")
      case _ => ()
    }
    // position 1 count = session count
    val sessions = graft.operators.Analytics.sessionize(spark, sf).count()
    assert(rows.head.getLong(1) == sessions)
    // COEC is the exact exposure-debiased ratio and averages to ~1
    // (event-weighted average of coec IS exactly 1 by construction)
    val totE = rows.map(_.getLong(1)).sum
    val totP = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val want = (BigInt(r.getLong(2)) * totE * 1000000 /
        (BigInt(r.getLong(1)) * totP)).toLong
      assert(r.getLong(4) == want, s"pos ${r.getLong(0)} coec")
    }
  }

  test("assortativity is a correlation: bounded, and exact on hand graphs") {
    val r = Assortativity.assortativity(spark, sf).collect().head
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0)
    assert(r.getAs[Long]("n_edges") ==
      Tables.edges(spark, sf).count())
    // a star graph (hub -> leaves) is perfectly disassortative only
    // with degree variance on both sides; a 2-regular ring has NO
    // variance -> NULL (the guard, not a 0/0)
    import spark.implicits._
    val ring = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("src", "dst")
    ring.createOrReplaceTempView("__ring")
    val ringMoments = {
      import org.apache.spark.sql.functions._
      val outdeg = ring.groupBy(col("src")).agg(count(lit(1)).as("x"))
      val indeg = ring.groupBy(col("dst")).agg(count(lit(1)).as("y"))
      ring.join(outdeg, Seq("src")).join(indeg, Seq("dst"))
        .agg(variance(col("x")).as("vx")).collect().head.getDouble(0)
    }
    assert(ringMoments == 0.0, "ring degrees are constant: variance 0")
  }
}
