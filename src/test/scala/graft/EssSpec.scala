package graft

import graft.operators.Ess
import org.scalatest.funsuite.AnyFunSuite

class EssSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def rowOf(ws: Seq[Double]): Map[String, Any] = {
    val r = Ess.ess(ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "quality")).collect().head
    r.schema.fieldNames.zip(r.toSeq).toMap
  }

  test("equal weights: ESS = n exactly, ess_frac = 1") {
    val got = rowOf(Seq.fill(8)(0.5))
    assert(got("n") == 8L)
    assert(got("ess") == 8.0)
    assert(got("ess_frac") == 1.0)
    assert(got("max_share") == 0.125)
  }

  test("one dominant weight collapses ESS toward 1") {
    // w = (1000, 1, 1, 1): ESS = 1003009/1000003 ≈ 1.003
    val got = rowOf(Seq(1000.0, 1.0, 1.0, 1.0))
    val ess = got("ess").asInstanceOf[Double]
    assert(ess > 1.0 && ess < 1.01)
    assert(got("max_share").asInstanceOf[Double] > 0.99)
  }

  test("hand-computed Kish identity on mixed weights") {
    val ws = Seq(0.2, 0.4, 0.4, 0.8)
    val sw = ws.sum; val sww = ws.map(w => w * w).sum
    val got = rowOf(ws)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got("ess") == r6(sw * sw / sww))
    assert(got("ess_frac") == r6(sw * sw / sww / 4))
    assert(got("max_share") == r6(0.8 / sw))
    // n <= TopK: the tail IS the whole mass
    assert(got("topk_share") == 1.0)
  }

  test("all-zero weights report NULL diagnostics, not a divide-by-zero") {
    val r = Ess.ess(Seq((1L, 0.0), (2L, 0.0)).toDF("doc_id", "quality"))
      .collect().head
    assert(r.getAs[Long]("n") == 2L)
    assert(r.isNullAt(r.fieldIndex("ess")))
    assert(r.isNullAt(r.fieldIndex("max_share")))
  }

  test("topk_share isolates the concentration tail beyond max_share") {
    // 150 light docs + 100 heavy: top-100 holds 100*10/(100*10+150*1)
    val ws = Seq.fill(150)(1.0) ++ Seq.fill(100)(10.0)
    val got = rowOf(ws)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got("topk_share") == r6(1000.0 / 1150.0))
    assert(got("max_share") == r6(10.0 / 1150.0))
  }
}
