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
}
