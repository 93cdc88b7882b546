package graft

import graft.operators.{Ann, OPQ, PQ}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OPQSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private val Dim = Ann.Dim
  private val M = 8

  private lazy val base =
    Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))

  // block-skewed corpus: the first 8 dims carry 8x the scale (64x the
  // variance) - the structure contiguous slicing handles worst, since
  // subspace 0 gets ALL the hot dims
  private lazy val skewed = base.select(col("vec_id"),
    transform(col("embedding"), (x, i) =>
      (x * when(i < 8, lit(8.0)).otherwise(lit(1.0))).cast("float"))
      .as("embedding")).cache()

  private def distortion(corpus: DataFrame): Double = {
    val books = PQ.fit(corpus, Dim, M, 16)
    val rec = PQ.decode(PQ.encode(corpus, books, Dim), books)
      .withColumnRenamed("embedding", "rec")
    rec.join(corpus, "vec_id")
      .select(avg(aggregate(
        zip_with(col("rec"), col("embedding"),
          (a, b) => pow(a.cast("double") - b.cast("double"), lit(2))),
        lit(0.0), (acc, x) => acc + x)).as("d"))
      .head().getDouble(0)
  }

  test("fitPermutation is a deterministic bijection with balanced subspace loads") {
    val p1 = OPQ.fitPermutation(skewed, Dim, M)
    val p2 = OPQ.fitPermutation(skewed, Dim, M)
    assert(p1.toSeq == p2.toSeq, "permutation must be deterministic")
    assert(p1.sorted.toSeq == (0 until Dim), "must be a bijection of 0..dim-1")
    // each subspace gets exactly one of the 8 hot dims (0..7)
    val sub = Dim / M
    val hotPerSub = (0 until M).map(j =>
      p1.slice(j * sub, (j + 1) * sub).count(_ < 8))
    assert(hotPerSub.forall(_ == 1),
      s"hot dims must spread one per subspace, got $hotPerSub")
    // inverse round-trips
    val inv = OPQ.inverse(p1)
    assert(p1.map(inv).zipWithIndex.forall { case (v, i) => inv(p1(i)) == i && v >= 0 })
  }

  test("permute is exact reordering and inverse-permute restores the vector") {
    val perm = OPQ.fitPermutation(skewed, Dim, M)
    val rows = skewed.limit(10)
      .select(col("embedding").as("orig"),
        OPQ.permute(OPQ.permute(col("embedding"), perm),
          OPQ.inverse(perm)).as("back"),
        OPQ.permute(col("embedding"), perm).as("permuted"))
      .as[(Seq[Float], Seq[Float], Seq[Float])].collect()
    rows.foreach { case (orig, back, permuted) =>
      assert(back == orig, "inverse(perm) . perm must be identity")
      assert(permuted.indices.forall(t => permuted(t) == orig(perm(t))))
    }
  }

  test("balanced-variance reordering cuts PQ distortion on skewed embeddings") {
    val perm = OPQ.fitPermutation(skewed, Dim, M)
    val rotated = skewed.select(col("vec_id"),
      OPQ.permute(col("embedding"), perm).as("embedding"))
    val plain = distortion(skewed)
    val opq = distortion(rotated)
    assert(plain > 0 && opq > 0)
    assert(opq < plain * 0.9,
      s"balanced assignment must cut distortion >10%: plain=$plain opq=$opq")
  }

  test("full OPQ rotation is orthogonal and at least matches the permutation init") {
    val r = OPQ.fitRotation(skewed, Dim, M, kcode = 16, opqIters = 2)
    // orthogonality: R·Rᵀ = I (every Procrustes solution is a product
    // of orthogonal factors)
    for (i <- 0 until Dim; j <- 0 until Dim) {
      val dot = (0 until Dim).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8,
        s"R·Rᵀ[$i][$j] = $dot, want $want")
    }
    // deterministic fit
    val r2 = OPQ.fitRotation(skewed, Dim, M, kcode = 16, opqIters = 2)
    assert(r.flatten.toSeq == r2.flatten.toSeq, "rotation must be deterministic")

    val perm = OPQ.fitPermutation(skewed, Dim, M)
    val permD = distortion(skewed.select(col("vec_id"),
      OPQ.permute(col("embedding"), perm).as("embedding")))
    val rotD = distortion(skewed.select(col("vec_id"),
      OPQ.rotate(col("embedding"), r).as("embedding")))
    val plainD = distortion(skewed)
    // alternation only descends from the permutation init (small slack
    // for the fresh k-means re-init in the measurement refit)
    assert(rotD < permD * 1.02 && rotD < plainD * 0.9,
      s"full OPQ must not regress: plain=$plainD perm=$permD rot=$rotD")
  }
}
