package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding")).persist()
  private lazy val model = Pca.fit(emb, 8)

  test("components are orthonormal and satisfy the eigen equation on the corpus covariance") {
    val d = Pca.Dim
    // orthonormality
    for (a <- model.components; b <- model.components) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val want = if (a eq b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8)
    }
    // rebuild the covariance from the exact moment frame and check C·v = λ·v
    val vs = emb.select(col("embedding")).as[Seq[Float]].collect()
    val n = vs.length.toDouble
    val mean = Array.tabulate(d)(i => vs.map(_(i).toDouble).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      vs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
    model.components.zip(model.eigvals).foreach { case (v, lm) =>
      val cv = Array.tabulate(d)(i => v.indices.map(j => cov(i)(j) * v(j)).sum)
      val resid = cv.zip(v).map { case (a, b) => math.abs(a - lm * b) }.max
      // moment sums are micro-quantized; the double recount differs in
      // the quantization tail only
      assert(resid < 1e-5, s"eigpair residual $resid at eigval $lm")
    }
  }

  test("eigenvalues are variance-descending and top-8 beats the isotropic share") {
    assert(model.eigvals.zip(model.eigvals.tail).forall { case (a, b) => a >= b })
    assert(model.explained > 8.0 / Pca.Dim,
      s"explained=${model.explained} — top directions must beat isotropy")
  }

  test("projection is the centered mat-vec, codegen path ≡ driver fold") {
    val got = Pca.project(emb, model)
      .as[(Long, Array[Float])].collect().toMap
    val vs = emb.as[(Long, Array[Float])].collect()
    vs.foreach { case (id, v) =>
      val want = model.components.map { c =>
        (c.zip(v).map { case (a, b) => a * b }.sum -
          c.zip(model.mean).map { case (a, b) => a * b }.sum).toFloat
      }
      val g = got(id)
      assert(g.length == 8)
      g.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4) }
    }
  }

  test("moment buffers merge by addition: incremental fit is bit-identical to one-shot") {
    val a = emb.filter(col("vec_id") % 3 === 0)
    val b = emb.filter(col("vec_id") % 3 =!= 0)
    val merged = Pca.mergeMoments(Pca.moments(a), Pca.moments(b))
    val oneShot = Pca.moments(emb)
    assert(merged.toSeq == oneShot.toSeq, "exact integer moments add")
    val m1 = Pca.fitFromMoments(merged, 8)
    val m2 = Pca.fitFromMoments(oneShot, 8)
    assert(m1.mean.toSeq == m2.mean.toSeq)
    assert(m1.eigvals.toSeq == m2.eigvals.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
  }

  test("mean retained pairwise-distance mass tracks the explained-variance fraction") {
    import scala.util.Random
    val rnd = new Random(11)
    val vs = emb.as[(Long, Array[Float])].collect()
    val pca = Pca.project(emb, model).as[(Long, Array[Float])].collect().toMap
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val pairs = Seq.fill(300)((vs(rnd.nextInt(vs.length)), vs(rnd.nextInt(vs.length))))
      .filter { case (a, b) => a._1 != b._1 }
    val kept = pairs.map { case ((ia, va), (ib, vb)) =>
      d2(pca(ia), pca(ib)) / d2(va, vb)
    }
    val meanKept = kept.sum / kept.size
    // difference vectors draw from (roughly) the same covariance, so the
    // share of their squared length living in the top-8 eigenspace is
    // the explained-variance fraction
    assert(math.abs(meanKept - model.explained) < 0.1,
      s"meanKept=$meanKept explained=${model.explained}")
    assert(kept.forall(r => r >= 0.0 && r <= 1.0 + 1e-6),
      "an orthogonal projection never grows a distance")
  }
}
