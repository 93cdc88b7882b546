package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import scala.collection.mutable

/** Misra–Gries heavy-hitters summary — the TOP-K member of the
  * mergeable-artifact family ([[Bloom]]: "seen at all?", [[Cms]]:
  * "roughly how often?", this: "which items dominate?") in bounded
  * memory: at most k (item, count) pairs regardless of corpus size,
  * where the exact answer ([[graft.operators.Corpus]] q_vocab) pays a
  * |vocab|-sized shuffle. The screen in front of exact vocabulary
  * counting: a weekly 100 TB pass keeps k·|partitions| pairs in
  * flight, total driver residency k pairs.
  *
  * Guarantees (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable summaries", PODS'12): estimates never OVERcount, and
  * undercount by at most (n − Σ̂)/(k+1) ≤ n/(k+1), where Σ̂ is the sum
  * of stored counters — so every item with true frequency > n/(k+1)
  * is GUARANTEED present (no false negatives above the threshold; the
  * Bloom no-FN contract in frequency form). Merge: add counters
  * pointwise, then if more than k survive subtract the (k+1)-th
  * largest count from all and drop the non-positive — the bound is
  * preserved under any merge tree (the [[Cms]]/[[Hll]] incremental
  * contract, so per-batch summaries fold without rescans).
  *
  * The summary is ORDER-DEPENDENT in its exact counter values (unlike
  * [[Cms]]/[[Hll]] registers): two partitionings can store different
  * counts for the same stream. Every guarantee above is
  * order-INDEPENDENT, which is why this is a tested artifact, not an
  * oracle query — the spec asserts the bounds, not the bytes.
  */
object Heavy {

  final case class Summary(k: Int, counters: Map[String, Long], total: Long) {

    /** Stored-counter sum Σ̂ — the accounting term of the error bound. */
    def counterSum: Long = counters.valuesIterator.sum

    /** Per-item undercount bound: true(g) − estimate(g) ≤ this. */
    def maxUndercount: Long = (total - counterSum) / (k + 1)

    /** Never above the true count; within [[maxUndercount]] below. */
    def estimate(g: String): Long = counters.getOrElse(g, 0L)

    /** Upper bound on any ABSENT item's true count: an item not
      * stored was decremented to zero at most maxUndercount times.
      */
    def absentBound: Long = maxUndercount

    /** Top-n stored items by estimate, count-desc then item. */
    def topK(n: Int): Seq[(String, Long)] =
      counters.toSeq.sortBy { case (g, c) => (-c, g) }.take(n)

    /** Pointwise-add then reduce-to-k (subtract the (k+1)-th largest,
      * drop ≤0). Associative-in-bound: any merge order keeps the
      * (n − Σ̂)/(k+1) undercount guarantee.
      */
    def merge(o: Summary): Summary = {
      require(k == o.k, "capacity mismatch")
      val add = mutable.Map.empty[String, Long]
      counters.foreach { case (g, c) => add(g) = add.getOrElse(g, 0L) + c }
      o.counters.foreach { case (g, c) => add(g) = add.getOrElse(g, 0L) + c }
      val reduced: Map[String, Long] =
        if (add.size <= k) add.toMap
        else {
          val cut = add.values.toSeq.sortBy(-_).apply(k) // (k+1)-th largest
          add.iterator.collect {
            case (g, c) if c - cut > 0 => g -> (c - cut)
          }.toMap
        }
      Summary(k, reduced, total + o.total)
    }
  }

  /** Classic single-stream fold in O(k) space. Decrement-all is
    * amortized O(1): each decrement pass is paid for by k+1 arrivals.
    */
  def foldStream(it: Iterator[String], k: Int): Summary = {
    val m = mutable.Map.empty[String, Long]
    var n = 0L
    it.foreach { g =>
      n += 1
      m.get(g) match {
        case Some(c) => m(g) = c + 1
        case None if m.size < k => m(g) = 1L
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          m.foreach { case (h, c) =>
            if (c == 1L) dead += h else m(h) = c - 1 }
          dead.foreach(m.remove)
      }
    }
    Summary(k, m.toMap, n)
  }

  /** Distributed fit over a one-gram-per-row frame: each partition
    * folds its slice in O(k) memory, the ≤ |partitions| summaries
    * (k pairs each) collect under the bounded-statistic contract and
    * merge in partition order. No shuffle at all — the sketch rides
    * the scan, like every serve-side kernel in this family.
    */
  def fit(grams: DataFrame, gramCol: String, k: Int): Summary = {
    import grams.sparkSession.implicits._
    val partials = grams.select(col(gramCol).cast("string"))
      .as[String]
      .mapPartitions(it => Iterator.single(foldStream(it, k)))(
        org.apache.spark.sql.Encoders.kryo[Summary])
      .collect()
    if (partials.isEmpty) Summary(k, Map.empty, 0L)
    else partials.reduce(_ merge _)
  }
}
