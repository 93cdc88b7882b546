package graft

import graft.operators.Woe
import org.scalatest.funsuite.AnyFunSuite

class WoeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def lnMicro(c: Long): Long =
    math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong

  test("balanced buckets: WOE exactly 0 everywhere, IV exactly 0") {
    // each bucket 4 good / 4 bad, totals 8/8: the smoothed log-odds
    // terms cancel symmetrically
    val rows = for (b <- Seq("a", "b"); g <- 0 until 4; v <- Seq(1L, 0L))
      yield (b, v)
    val out = Woe.woeOf(rows.toDF("bucket", "good")).collect()
    assert(out.forall(_.getAs[Long]("woe_micro") == 0L))
    assert(out.forall(_.getAs[Double]("iv_contrib") == 0.0))
    assert(out.forall(_.getAs[Double]("iv_total") == 0.0))
  }

  test("separating buckets: signs point at the target, IV strong") {
    val rows = Seq.fill(40)(("allgood", 1L)) ++ Seq.fill(40)(("allbad", 0L))
    val out = Woe.woeOf(rows.toDF("bucket", "good")).collect()
      .map(r => r.getAs[String]("bucket") -> r).toMap
    assert(out("allgood").getAs[Long]("woe_micro") > 0L)
    assert(out("allbad").getAs[Long]("woe_micro") < 0L)
    assert(out("allgood").getAs[Double]("iv_total") > 0.3) // "strong" band
  }

  test("woe matches the hand micro-nat computation") {
    // bucket x: 3 good 1 bad; bucket y: 1 good 3 bad; G=B=4, m=2
    val rows = Seq(("x", 1L), ("x", 1L), ("x", 1L), ("x", 0L),
      ("y", 1L), ("y", 0L), ("y", 0L), ("y", 0L))
    val out = Woe.woeOf(rows.toDF("bucket", "good")).collect()
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("woe_micro")).toMap
    val expX = (lnMicro(4) - lnMicro(6)) - (lnMicro(2) - lnMicro(6))
    assert(out("x") == expX)
    assert(out("y") == -expX) // symmetric corpus: mirror bucket negates
  }

  test("all-good bucket stays finite under +1/+m smoothing") {
    val rows = Seq.fill(10)(("pure", 1L)) ++
      Seq(("mixed", 1L), ("mixed", 0L), ("mixed", 0L))
    val out = Woe.woeOf(rows.toDF("bucket", "good")).collect()
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("woe_micro"))))
    val pure = out.find(_.getAs[String]("bucket") == "pure").get
    // bad+1 = 1 -> ln 1 = 0: the smoothed bad-side term is -L(B+m)
    assert(pure.getAs[Long]("woe_micro") ==
      (lnMicro(11) - lnMicro(13)) - (lnMicro(1) - lnMicro(4)))
  }
}
