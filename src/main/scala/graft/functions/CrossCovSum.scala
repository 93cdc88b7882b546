package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A row of paired vectors feeding [[CrossCovSum]]. */
case class VecPair(x: Seq[Float], y: Seq[Float])

/** Σ_rows x·yᵀ as a typed Aggregator — the d×d cross-covariance the
  * OPQ Procrustes step needs (`A[i][j] = Σ_n x_n[i]·y_n[j]`,
  * flattened row-major). Plans as ObjectHashAggregate with a map-side
  * partial pass: each partition folds its rows into one d² buffer
  * (32 KB at d=64) and the shuffle carries one buffer per partition —
  * the corpus itself is never exchanged, which is what makes an OPQ
  * iteration affordable at 100 TB (its cost is the PQ fit, not the
  * covariance).
  */
class CrossCovSum(d: Int)
  extends Aggregator[VecPair, Array[Double], Seq[Double]] {

  override def zero: Array[Double] = new Array[Double](d * d)

  override def reduce(b: Array[Double], a: VecPair): Array[Double] = {
    val n = math.min(d, math.min(a.x.length, a.y.length))
    var i = 0
    while (i < n) {
      val xi = a.x(i).toDouble
      var j = 0
      while (j < n) {
        b(i * d + j) += xi * a.y(j).toDouble
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(b: Array[Double]): Seq[Double] = b.toSeq

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}
