package graft

import graft.operators.BestSplit
import org.scalatest.funsuite.AnyFunSuite

class BestSplitSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("perfectly separable: both children pure, gain = parent impurity") {
    // y = 1 iff x <= 10: the stump recovers the boundary exactly
    val rows = (1L to 20L).map(x => (x, if (x <= 10L) 1L else 0L))
    val r = BestSplit.bestSplitOf(rows.toDF("x", "y")).collect().head
    assert(r.getAs[Long]("best_threshold") == 10L)
    assert(r.getAs[Long]("cost_micro") == 0L)
    assert(r.getAs[Long]("gain_micro") == r.getAs[Long]("parent_micro"))
    // parent: n=20, c=10 -> n*Gini = (400-100-100)/20 = 10 -> 1e7 micro
    assert(r.getAs[Long]("parent_micro") == 10000000L)
    assert(r.getAs[Long]("pos_left") == 10L && r.getAs[Long]("pos_right") == 0L)
  }

  test("constant target: every split costs 0 = parent, gain exactly 0") {
    val rows = (1L to 15L).map(x => (x, 1L))
    val r = BestSplit.bestSplitOf(rows.toDF("x", "y")).collect().head
    assert(r.getAs[Long]("parent_micro") == 0L)
    assert(r.getAs[Long]("gain_micro") == 0L)
  }

  test("tie-break toward the smallest threshold") {
    // symmetric data: splitting at 1 or at 3 gives the same cost;
    // the struct-min must pick x = 1
    val rows = Seq((1L, 1L), (2L, 0L), (3L, 0L), (4L, 1L))
    val r = BestSplit.bestSplitOf(rows.toDF("x", "y")).collect().head
    assert(r.getAs[Long]("best_threshold") == 1L)
  }

  test("matches a brute-force double-Gini argmin on a mixed frame") {
    val rows = (0L until 120L).map(i =>
      ((i * 17L) % 40L, if ((i * 17L) % 40L < 13L || i % 10 == 0) 1L else 0L))
    val r = BestSplit.bestSplitOf(rows.toDF("x", "y")).collect().head
    // brute force in doubles over the same candidate grid
    def cost(th: Long): Double = {
      val (l, rt) = rows.partition(_._1 <= th)
      def side(s: Seq[(Long, Long)]): Double = {
        if (s.isEmpty) 0.0
        else {
          val n = s.size.toDouble; val c = s.count(_._2 == 1L).toDouble
          (n * n - c * c - (n - c) * (n - c)) / n
        }
      }
      side(l) + side(rt)
    }
    val cands = rows.map(_._1).distinct.sorted.dropRight(1)
    val bruteBest = cands.minBy(th => (cost(th), th))
    assert(r.getAs[Long]("best_threshold") == bruteBest)
    assert(math.abs(r.getAs[Long]("cost_micro") / 1e6 - cost(bruteBest)) < 2e-6)
  }
}
