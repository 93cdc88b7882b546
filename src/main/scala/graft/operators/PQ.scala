package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization — the memory side of a production ANN index
  * (IVF-PQ): the d-dim embedding space is split into `m` subspaces of
  * d/m dims, each with its own k-centroid codebook ([[KMeansVec]] per
  * subspace), and a vector is stored as `m` small codes instead of `d`
  * floats (m·log2(k) bits — 64 floats → 8 bytes at m=8, k=256). The
  * coarse IVF quantizer prunes WHICH vectors to score;
  * PQ compresses WHAT is resident to score them with.
  *
  * Scale shape: training is m independent [[KMeansVec.fit]] runs on
  * sliced columns (each assignment pass shuffle-free); encoding is m
  * chained [[graft.functions.NearestCentroids]] per-row argmaxes over
  * the sliced embedding — one narrow pass over the corpus, zero
  * shuffle; decoding is m broadcast joins against k-row codebooks.
  * Nothing but the corpus scan grows with the data.
  *
  * Determinism: inherits [[KMeansVec]]'s deterministic init/ties, so
  * fit → encode → decode is reproducible run to run.
  */
object PQ {

  /** Per-subspace codebooks for `(vec_id, embedding)` vectors of
    * dimension `dim`. Returns `m` frames of (cent_id, c_emb, c_nrm).
    */
  def fit(vectors: DataFrame, dim: Int, m: Int, k: Int,
    iters: Int = 3): Seq[DataFrame] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    (0 until m).map { j =>
      KMeansVec.fit(
        vectors.select(col("vec_id"),
          slice(col("embedding"), j * sub + 1, sub).as("embedding")),
        k, iters)
    }
  }

  /** `(vec_id[, passthrough...], codes: array<long>)` — code j is the
    * nearest subspace-j centroid of the vector's j-th slice. One
    * narrow pass, no shuffle; `passthrough` columns (e.g. the coarse
    * IVF list id) ride the same pass, which is how a production index
    * build writes list assignment + codes together instead of paying
    * an id-shuffle join to recombine them.
    */
  def encode(vectors: DataFrame, codebooks: Seq[DataFrame], dim: Int,
    passthrough: Seq[String] = Nil): DataFrame = {
    val m = codebooks.size
    val sub = dim / m
    val coded = codebooks.zipWithIndex.foldLeft(vectors) { case (df, (cb, j)) =>
      df.withColumn(s"__c$j",
        element_at(graft.functions.NearestCentroids.fromFrame(
          slice(col("embedding"), j * sub + 1, sub), cb, 1), 1)
          .getField("cent_id"))
    }
    coded.select(col("vec_id") +: passthrough.map(col) :+
      array((0 until m).map(j => col(s"__c$j")): _*).as("codes"): _*)
  }

  /** Reconstructed vectors from codes: concat of the m looked-up
    * subspace centroids (broadcast joins, k rows each).
    */
  def decode(codes: DataFrame, codebooks: Seq[DataFrame],
    passthrough: Seq[String] = Nil): DataFrame = {
    val m = codebooks.size
    val joined = codebooks.zipWithIndex.foldLeft(codes) { case (df, (cb, j)) =>
      df.join(broadcast(cb.select(col("cent_id").as(s"__c$j"),
        col("c_emb").as(s"__e$j"))),
        element_at(col("codes"), j + 1) === col(s"__c$j"))
    }
    joined.select(col("vec_id") +: passthrough.map(col) :+
      concat((0 until m).map(j => col(s"__e$j")): _*).as("embedding"): _*)
  }
}
