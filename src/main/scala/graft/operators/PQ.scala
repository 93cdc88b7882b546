package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    // The m subspace quantizers are fully independent job chains over
    // the same corpus. Submitting them from a small thread pool lets
    // subspace j+1's stages back-fill executor slots freed by subspace
    // j's straggler tail instead of idling the cluster m times — each
    // fit's own jobs (and therefore its centroids) are unchanged.
    Concurrently(0 until m) { j =>
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

  /** [[encode]] from already-collected `(cent_id, c_emb)` codebook
    * rows (one per subspace, exactly the stored rows) — the form
    * [[graft.sources.IndexStore.append]] uses so one codebooks
    * read+collect serves all m argmaxes instead of m+2 re-reads of the
    * same tiny parquet. Rows are sorted by cent_id and norms recomputed
    * with the same ascending-index double fold as [[graft.operators.Ann.norm]]
    * ([[graft.functions.VecDot]] order), so the built
    * [[graft.functions.NearestCentroids]] expression is value-identical
    * to the frame-collected one.
    */
  def encodeFromRows(vectors: DataFrame, perSub: Seq[Seq[(Long, Array[Float])]],
    dim: Int, passthrough: Seq[String] = Nil): DataFrame = {
    val m = perSub.size
    val sub = dim / m
    val coded = perSub.zipWithIndex.foldLeft(vectors) { case (df, (rows0, j)) =>
      val rows = rows0.sortBy(_._1)
      val ids = rows.map(_._1).toArray
      val vecs = rows.map(_._2).toArray
      val nrms = vecs.map { v =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
        math.sqrt(s)
      }
      df.withColumn(s"__c$j",
        element_at(graft.functions.NearestCentroids(
          slice(col("embedding"), j * sub + 1, sub), ids, vecs, nrms, 1), 1)
          .getField("cent_id"))
    }
    coded.select(col("vec_id") +: passthrough.map(col) :+
      array((0 until m).map(j => col(s"__c$j")): _*).as("codes"): _*)
  }

  /** Reconstructed vectors from codes: concat of the m looked-up
    * subspace centroids (broadcast joins, k rows each). Reconstruction
    * is for EXPORT (handing full vectors to a consumer); scoring codes
    * goes through [[adcDot]] — rebuilding floats to score them
    * surrenders the memory win PQ exists for.
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

  /** Driver-resident codebook matrices — the task reference object for
    * ADC scoring (the [[graft.functions.NearestCentroids]] pattern: m·k
    * small centroid rows are index METADATA, bounded by construction,
    * and belong next to the generated code, not in a join). `books(j)`
    * is dense, indexed by `code - 1`; a cent_id gap (an empty Lloyd
    * cluster) holds a zero vector that no code ever references.
    */
  final case class PqBooks(books: Array[Array[Array[Float]]]) {
    val m: Int = books.length
    val codeSlots: Int = books(0).length
    /** ‖book_j[c]‖² in [[graft.functions.VecDot]] fold order — feeds
      * [[recNorm]]: a reconstruction's norm² is the SUM of its subspace
      * norm²s (concatenation), so the resident set never materializes.
      */
    lazy val norm2: Array[Array[Double]] = books.map(_.map { v =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      s
    })
  }

  /** Collect fitted codebook frames into [[PqBooks]] (m·k rows — the
    * same bounded collect that ships centroids to
    * [[graft.functions.NearestCentroids]]).
    */
  def collectBooks(codebooks: Seq[DataFrame]): PqBooks =
    collectBooksFromRows(Concurrently(codebooks) { cb =>
      cb.select(col("cent_id"), col("c_emb")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq
    })

  /** [[PqBooks]] from already-collected `(cent_id, c_emb)` rows per
    * subspace (how [[graft.sources.IndexStore]] rehydrates a stored
    * codebook table).
    */
  def collectBooksFromRows(per: Seq[Seq[(Long, Array[Float])]]): PqBooks = {
    val maps = per.map(_.toMap)
    val slots = maps.map(_.keysIterator.max).max.toInt
    val sub = maps.head.valuesIterator.next().length
    PqBooks(maps.map { mp =>
      Array.tabulate(slots)(i => mp.getOrElse((i + 1).toLong, new Array[Float](sub)))
    }.toArray)
  }

  /** Reconstruction norm of a `codes` column via the per-subspace norm²
    * tables — a per-row lookup riding the encode pass, so the index
    * stores (codes, rec_nrm) and cosine needs no decode.
    */
  def recNorm(codes: Column, books: PqBooks): Column =
    sqrt((0 until books.m).map(j =>
      element_at(typedLit(books.norm2(j).toSeq),
        element_at(codes, j + 1).cast("int"))).reduce(_ + _))

  /** ADC lookup table for ONE query row: `lut[j][c] = dot(q_j, book_j[c])`
    * (m×k doubles). Built once per query — |Q|·m·k subspace dots total —
    * then broadcast with the probe rows; every resident code row is
    * scored by m array lookups ([[adcDot]]) instead of a decode join +
    * full-dimension dot. This is the asymmetric-distance computation of
    * Jégou et al., "Product Quantization for Nearest Neighbor Search"
    * (TPAMI 2011) §III — the query stays exact, only the corpus side is
    * quantized.
    */
  def adcLut(qEmb: Column, books: PqBooks, dim: Int): Column = {
    val sub = dim / books.m
    array((0 until books.m).map { j =>
      array((0 until books.codeSlots).map { c =>
        graft.functions.VecDot(slice(qEmb, j * sub + 1, sub),
          typedLit(books.books(j)(c).toSeq))
      }: _*)
    }: _*)
  }

  /** ADC dot product of a code row against a query's [[adcLut]]:
    * `Σ_j lut[j][codes[j]]` — m element_at lookups, codegen-friendly,
    * no reconstruction. Equals the decoded dot up to float-fold
    * association (per-subspace partials vs one flat fold).
    */
  def adcDot(lut: Column, codes: Column, m: Int): Column =
    (0 until m).map(j =>
      element_at(element_at(lut, j + 1),
        element_at(codes, j + 1).cast("int"))).reduce(_ + _)

  /** All k×k subspace-codebook dot products — the driver-side half of
    * SDC scoring ([[graft.functions.SdcDot]]): code-pair similarity
    * with no vectors and no decode. Folded in [[graft.functions.VecDot]]
    * order for parity with reconstructed dots.
    */
  def sdcTables(books: PqBooks): Array[Array[Array[Double]]] =
    Array.tabulate(books.m) { j =>
      Array.tabulate(books.codeSlots, books.codeSlots) { (a, b) =>
        val va = books.books(j)(a)
        val vb = books.books(j)(b)
        var s = 0.0
        var i = 0
        val n = math.min(va.length, vb.length)
        while (i < n) { s += va(i).toDouble * vb(i).toDouble; i += 1 }
        s
      }
    }
}
