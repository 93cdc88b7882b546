package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One hashed observation entering a KMV sketch. */
case class HashedVal(key: String, h: String, v: Double)

/** One retained sketch row: rank hash + its value. */
case class Kept(h: String, v: Double)

/** Bounded bottom-k-by-hash as a typed Aggregator — the state of a
  * KMV (k-minimum-values) sketch: keep the k rows with the SMALLEST
  * md5 rank hash. Like [[TopKByScore]] this plans as
  * ObjectHashAggregate with a map-side partial pass, so each
  * partition reduces to ≤ k rows per key before the shuffle — the
  * exchange carries k·partitions rows per key, never the corpus.
  *
  * Two properties the sketch inherits from "smallest k of a total
  * order" (both asserted in KmvSpec):
  *   - merge-EXACT: any split/merge order yields byte-identical
  *     state (min-k is associative and commutative) — unlike a
  *     random reservoir, whose merge is approximate;
  *   - duplicate-blind: a replayed row carries the same hash and is
  *     dropped on insert, so re-ingested batches don't skew the
  *     sample (the `PostingsStore.append` idempotence concern,
  *     solved structurally).
  */
class BottomKByHash(k: Int) extends Aggregator[HashedVal, Seq[Kept], Seq[Kept]] {

  /** Insert into an h-ascending buffer of size <= k. */
  private def insert(b: Seq[Kept], h: String, v: Double): Seq[Kept] = {
    if (b.size >= k && h >= b.last.h) return b
    if (b.exists(_.h == h)) return b // replayed row: identical hash
    val (smaller, rest) = b.span(x => x.h < h)
    (smaller :+ Kept(h, v)) ++ rest.take(k - smaller.size - 1)
  }

  override def zero: Seq[Kept] = Vector.empty

  override def reduce(b: Seq[Kept], a: HashedVal): Seq[Kept] =
    insert(b, a.h, a.v)

  override def merge(b1: Seq[Kept], b2: Seq[Kept]): Seq[Kept] =
    b2.foldLeft(b1)((b, x) => insert(b, x.h, x.v))

  override def finish(b: Seq[Kept]): Seq[Kept] = b

  override def bufferEncoder: Encoder[Seq[Kept]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Kept]] = ExpressionEncoder()
}
