package graft

import graft.operators.{Mmd, Pca}
import org.scalatest.funsuite.AnyFunSuite

class MmdSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val D = Pca.Dim

  private def frame(vecs: Seq[Array[Float]]) =
    vecs.map(v => Tuple1(v.toSeq)).toDF("embedding")

  private def report(ref: Seq[Array[Float]], cur: Seq[Array[Float]]) = {
    val r = Mmd.mmd(spark, frame(ref), frame(cur)).collect().head
    (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
      r.getAs[Long]("mean_shift_nano"), r.getAs[Long]("shape_shift_nano"))
  }

  private def unit(i: Int, scale: Float): Array[Float] = {
    val v = new Array[Float](D); v(i) = scale; v
  }

  test("identical slices are EXACTLY zero on both kernels") {
    val vs = (0 until 40).map(i => unit(i % D, 0.3f + (i % 7) * 0.1f))
    val (na, nb, m, s) = report(vs, vs)
    assert(na == 40L && nb == 40L)
    assert(m == 0L && s == 0L, s"identity must be exact zero: $m, $s")
  }

  test("pure mean shift: closed form on a planted offset") {
    // ref all zeros, cur all 0.5 on dim 0: dmu = 0.5 => mean shift
    // = 0.25 => 250_000_000 nano; M shifts too (M = mu mu^T here)
    val (_, _, m, s) = report(
      Seq.fill(50)(unit(0, 0f)), Seq.fill(50)(unit(0, 0.5f)))
    assert(m == 250000000L, s"0.5^2 in nano: $m")
    assert(s == 62500000L, s"dM(0,0) = 0.25 -> 0.0625 in nano: $s")
  }

  test("shape shift with zero mean shift: the beyond-the-mean detector") {
    // symmetric +-v slices: means are exactly 0 both sides; the
    // current slice doubles the scale so its second moment is 4x
    val ref = Seq.fill(20)(unit(0, 0.5f)) ++ Seq.fill(20)(unit(0, -0.5f))
    val cur = Seq.fill(20)(unit(0, 1.0f)) ++ Seq.fill(20)(unit(0, -1.0f))
    val (_, _, m, s) = report(ref, cur)
    assert(m == 0L, s"symmetric slices have equal means: $m")
    // M_ref(0,0) = 0.25, M_cur(0,0) = 1.0 -> dM = 0.75 -> 0.5625
    assert(s == 562500000L, s"shape shift closed form: $s")
  }

  test("empty slice reports NULL shifts, not a fabricated zero") {
    val r = Mmd.mmd(spark, frame(Seq.fill(3)(unit(0, 1f))), frame(Nil))
      .collect().head
    assert(r.getAs[Long]("n_cur") == 0L)
    assert(r.isNullAt(r.fieldIndex("mean_shift_nano")))
    assert(r.isNullAt(r.fieldIndex("shape_shift_nano")))
  }
}
