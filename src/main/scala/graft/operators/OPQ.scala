package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OPQ-style coordinate reordering before [[PQ]] fit — the
  * balanced-variance special case of optimized product quantization
  * (Ge et al., CVPR'13 §4 "natural" baselines; also Jégou et al.'s
  * structured reordering): PQ's distortion is the SUM of per-subspace
  * quantization errors, and contiguous slicing performs worst exactly
  * when variance concentrates in a few adjacent dimensions (PCA'd or
  * block-structured embeddings), overloading one codebook of k
  * centroids while others quantize noise. A permutation that spreads
  * high-variance dimensions evenly across the m subspaces recovers
  * most of full OPQ's gain with no rotation matrix: applying it is a
  * per-row array shuffle (codegen'd projection, zero math), and the
  * fit below is ONE shuffle-free aggregate over the corpus.
  *
  * Composition: `permute` the corpus before [[PQ.fit]]/[[PQ.encode]]
  * (or [[graft.sources.IndexStore.build]]) and each query batch with
  * the SAME stored permutation before search — cosine scores are
  * permutation-invariant, so ranks and recall semantics are unchanged
  * while per-code distortion drops.
  */
object OPQ {

  /** Learn a balanced-variance assignment: output dimension `t`
    * reads input dimension `perm(t)`, and subspace `j` owns the
    * output slice `[j·dim/m, (j+1)·dim/m)`. Greedy LPT with capacity:
    * dimensions in decreasing variance order each go to the
    * least-loaded subspace with a free slot (ties toward the lower
    * subspace/dimension index — fully deterministic). The per-dim
    * moments come from one pass of 2·dim agg columns — map-side
    * partial aggregation, no shuffle of the corpus.
    */
  def fitPermutation(vectors: DataFrame, dim: Int, m: Int): Array[Int] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val aggs = (0 until dim).flatMap { i =>
      Seq(avg(element_at(col("embedding"), i + 1)).as(s"m$i"),
        avg(pow(element_at(col("embedding"), i + 1), lit(2))).as(s"s$i"))
    }
    val r = vectors.agg(aggs.head, aggs.tail: _*).head()
    val variance = Array.tabulate(dim) { i =>
      val mean = r.getAs[Double](s"m$i")
      r.getAs[Double](s"s$i") - mean * mean
    }
    val cap = dim / m
    val cnt = new Array[Int](m)
    val load = new Array[Double](m)
    val groups = Array.fill(m)(List.empty[Int])
    variance.zipWithIndex.sortBy { case (v, i) => (-v, i) }.foreach {
      case (v, i) =>
        val j = (0 until m).filter(cnt(_) < cap)
          .minBy(j => (load(j), j))
        cnt(j) += 1
        load(j) += v
        groups(j) = i :: groups(j)
    }
    // ascending within a subspace: the permutation is canonical for a
    // given variance profile, not an artifact of assignment order
    groups.flatMap(_.sorted)
  }

  /** Reorder an `array<float>` embedding by `perm` — a flat array
    * constructor over `element_at`s, fused into the surrounding
    * projection by codegen.
    */
  def permute(emb: Column, perm: Array[Int]): Column =
    array(perm.map(p => element_at(emb, p + 1)): _*)

  /** The permutation taking a [[permute]]d vector back to input order
    * (for exporting reconstructions to consumers that expect it).
    */
  def inverse(perm: Array[Int]): Array[Int] = {
    val inv = new Array[Int](perm.length)
    perm.zipWithIndex.foreach { case (src, dst) => inv(src) = dst }
    inv
  }

  /** A permutation as its rotation matrix (`out = R·x` reads input dim
    * `perm(t)` into output dim `t`) — the non-parametric OPQ init.
    */
  def permMatrix(perm: Array[Int]): Array[Array[Double]] =
    Array.tabulate(perm.length, perm.length)((t, i) =>
      if (perm(t) == i) 1.0 else 0.0)

  /** FULL non-parametric OPQ (Ge et al., CVPR'13 alg. 2): alternate
    * (a) fit PQ codebooks on the rotated corpus, (b) solve the
    * orthogonal-Procrustes problem `min_R ‖R·x − rec(R·x)‖²` in closed
    * form — `R = V·Uᵀ` from the SVD of the d×d cross-covariance
    * `A = Σ_n x_n·y_nᵀ` ([[graft.functions.CrossCovSum]]: map-side
    * partial buffers, the corpus never shuffles). Both half-steps are
    * non-increasing in the quantization objective, so distortion only
    * falls from the [[fitPermutation]] init (asserted in OPQSpec).
    *
    * The SVD runs driver-side on the d×d covariance via cyclic Jacobi
    * eigendecomposition of AᵀA — 64×64 is index metadata, the same
    * size class as the centroid set, and keeping it off the cluster
    * avoids shipping a linear-algebra dependency into tasks.
    *
    * Per-iteration cluster cost: one rotated-projection pass +
    * [[PQ.fit]] + the covariance aggregate. Returns the dense rotation
    * (row-major, `out = R·x`); apply with [[rotate]] to the corpus
    * before [[PQ.fit]]/encode and to every query batch.
    */
  def fitRotation(vectors: DataFrame, dim: Int, m: Int, kcode: Int,
    opqIters: Int = 3, pqIters: Int = 3): Array[Array[Double]] = {
    import org.apache.spark.sql.Encoders
    val v0 = vectors.select(col("vec_id"), col("embedding"))
    var r = permMatrix(fitPermutation(v0, dim, m))
    var it = 0
    while (it < opqIters) {
      val rot = v0.select(col("vec_id"), rotate(col("embedding"), r).as("embedding"))
      val books = PQ.fit(rot, dim, m, kcode, pqIters)
      val rec = PQ.decode(PQ.encode(rot, books, dim), books)
        .withColumnRenamed("embedding", "rec")
      val pairs = v0.join(rec, "vec_id")
        .select(col("embedding").as("x"), col("rec").as("y"))
        .as(Encoders.product[graft.functions.VecPair])
      val flat = pairs.select(new graft.functions.CrossCovSum(dim).toColumn)
        .head()
      val a = Array.tabulate(dim, dim)((i, j) => flat(i * dim + j))
      r = procrustes(a)
      it += 1
    }
    r
  }

  /** Apply a [[fitRotation]] matrix — a codegen'd per-row mat-vec
    * ([[graft.functions.RotateVec]]).
    */
  def rotate(emb: Column, r: Array[Array[Double]]): Column =
    graft.functions.RotateVec(emb, r)

  /** `argmax_{R orthogonal} tr(R·A)` = `V·Uᵀ` for `A = U·Σ·Vᵀ`. */
  private def procrustes(a: Array[Array[Double]]): Array[Array[Double]] = {
    val d = a.length
    val (u, v) = svd(a)
    Array.tabulate(d, d)((i, j) => {
      var s = 0.0
      var k = 0
      while (k < d) { s += v(i)(k) * u(j)(k); k += 1 }
      s
    })
  }

  /** SVD `A = U·Σ·Vᵀ` of a square matrix via Jacobi eigendecomposition
    * of the symmetric AᵀA (V, Σ²), with `u_k = A·v_k/σ_k`; a
    * numerically-zero σ keeps the (already orthogonal) eigenvector
    * direction as its U column, which leaves tr(R·A) untouched.
    * Returns (U, V) as column matrices `u(i)(k) = U_{ik}`.
    */
  private def svd(a: Array[Array[Double]]): (Array[Array[Double]], Array[Array[Double]]) = {
    val d = a.length
    val ata = Array.tabulate(d, d)((i, j) => {
      var s = 0.0
      var k = 0
      while (k < d) { s += a(k)(i) * a(k)(j); k += 1 }
      s
    })
    val (evals, v) = eigSym(ata)
    val u = Array.ofDim[Double](d, d)
    var k = 0
    while (k < d) {
      val sigma = math.sqrt(math.max(evals(k), 0.0))
      var i = 0
      if (sigma > 1e-10) {
        while (i < d) {
          var s = 0.0
          var j = 0
          while (j < d) { s += a(i)(j) * v(j)(k); j += 1 }
          u(i)(k) = s / sigma
          i += 1
        }
      } else {
        while (i < d) { u(i)(k) = v(i)(k); i += 1 }
      }
      k += 1
    }
    (u, v)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * deterministic sweep order, converges quadratically; 64×64 runs in
    * microseconds. Returns (eigenvalues, eigenvector columns).
    */
  private[operators] def eigSym(sIn: Array[Array[Double]],
    maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = sIn.length
    val s = sIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(s)
    while (sweep < maxSweeps && off > 1e-11) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = s(p)(q)
          if (math.abs(apq) > 1e-15) {
            val theta = (s(q)(q) - s(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var i = 0
            while (i < n) {
              val sip = s(i)(p); val siq = s(i)(q)
              s(i)(p) = c * sip - sn * siq
              s(i)(q) = sn * sip + c * siq
              i += 1
            }
            i = 0
            while (i < n) {
              val spi = s(p)(i); val sqi = s(q)(i)
              s(p)(i) = c * spi - sn * sqi
              s(q)(i) = sn * spi + c * sqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - sn * viq
              v(i)(q) = sn * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(s)
      sweep += 1
    }
    (Array.tabulate(n)(i => s(i)(i)), v)
  }

  private def offDiag(s: Array[Array[Double]]): Double = {
    var acc = 0.0
    var i = 0
    while (i < s.length) {
      var j = 0
      while (j < s.length) {
        if (i != j) acc += s(i)(j) * s(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(acc)
  }
}
