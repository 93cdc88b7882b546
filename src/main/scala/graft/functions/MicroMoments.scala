package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact second-moment sums of an embedding corpus in integer MICRO
  * units: each component is fixed to micro units (floor(x·1e6 + 0.5) —
  * the house fixed-point rule) BEFORE any addition, so
  * `Σ mᵢ·mⱼ`, `Σ mᵢ` and the count are exact longs — order-independent
  * where a double covariance fold differs by partition order, which is
  * what lets the covariance itself be hash-verified against the oracle
  * ([[graft.operators.Pca]] consumes it).
  *
  * Buffer layout: d² pair sums (row-major) ++ d component sums ++ count.
  * Plans as ObjectHashAggregate with map-side partials — each partition
  * folds to one ~33 KB buffer (d = 64), the corpus never shuffles.
  * Overflow headroom: |m| ≤ 2²¹ for |x| ≤ 2, so each product ≤ 2⁴²;
  * 2⁶³ tolerates > 2²⁰ rows per partition buffer and the merged total
  * up to ~2 × 10⁶ × corpus partitions — fine to 10¹¹ rows.
  */
class MicroCovSum(d: Int)
  extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](d * d + d + 1)

  override def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
    // ragged input fails FAST: a short vector would contribute zero to
    // the missing components' sums while still incrementing n —
    // silently skewing the hash-verified covariance instead of erroring
    require(v.length >= d,
      s"MicroCovSum(d=$d) fed a ${v.length}-component vector")
    val n = d
    val m = new Array[Long](n)
    var i = 0
    while (i < n) {
      m(i) = math.floor(v(i).toDouble * 1e6 + 0.5).toLong
      i += 1
    }
    i = 0
    while (i < n) {
      val mi = m(i)
      var j = 0
      while (j < n) {
        b(i * d + j) += mi * m(j)
        j += 1
      }
      b(d * d + i) += mi
      i += 1
    }
    b(d * d + d) += 1L
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
