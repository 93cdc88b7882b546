package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Scored ANN candidate row (grouping key carried for groupByKey). */
case class ScoredHit(query_id: Long, vec_id: Long, cos_sim: Double)

/** One ranked neighbour in a top-k buffer. */
case class Hit(cos_sim: Double, vec_id: Long)

/** Bounded top-k by (cos_sim desc, vec_id asc) as a typed Aggregator.
  *
  * This is the partial top-k the brute-force ANN needs at scale: the
  * row_number window it replaces exchanged the FULL |V|×|Q| score
  * matrix on query_id before ranking (windows have no partial
  * aggregation). An Aggregator plans as ObjectHashAggregate with a
  * map-side partial pass, so each partition reduces to at most k hits
  * per query before the shuffle — the exchange carries k·partitions
  * rows per query, not |V|.
  *
  * Duplicate candidates (the same vec_id reached via two probed IVF
  * lists) are dropped on insert — cosine is deterministic, so the
  * duplicate is bit-identical and "first wins" equals SELECT DISTINCT.
  * That removes the ivf path's pre-ranking distinct(), which was a
  * second full shuffle of the candidate set.
  *
  * NaN scores (a zero-norm degenerate vector) never beat anything and
  * rank LAST — deliberately: a SQL `ORDER BY sim DESC` window would
  * rank NaN first (both Spark and DuckDB sort NaN greatest), which is
  * never what a similarity search wants. Degenerate vectors should be
  * filtered upstream; if one slips through it can't displace real
  * neighbours here.
  */
class TopKByScore(k: Int) extends Aggregator[ScoredHit, Seq[Hit], Seq[Hit]] {

  private def beats(aSim: Double, aId: Long, b: Hit): Boolean =
    aSim > b.cos_sim || (aSim == b.cos_sim && aId < b.vec_id)

  /** Insert into a (sim desc, vec_id asc)-sorted buffer of size <= k. */
  private def insert(b: Seq[Hit], sim: Double, id: Long): Seq[Hit] = {
    if (b.exists(_.vec_id == id)) return b // duplicate candidate
    if (b.size >= k && !beats(sim, id, b.last)) return b
    val (better, rest) = b.span(h => !beats(sim, id, h))
    (better :+ Hit(sim, id)) ++ rest.take(k - better.size - 1)
  }

  override def zero: Seq[Hit] = Vector.empty

  override def reduce(b: Seq[Hit], a: ScoredHit): Seq[Hit] =
    insert(b, a.cos_sim, a.vec_id)

  override def merge(b1: Seq[Hit], b2: Seq[Hit]): Seq[Hit] =
    b2.foldLeft(b1)((b, h) => insert(b, h.cos_sim, h.vec_id))

  override def finish(b: Seq[Hit]): Seq[Hit] = b

  override def bufferEncoder: Encoder[Seq[Hit]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Hit]] = ExpressionEncoder()
}
