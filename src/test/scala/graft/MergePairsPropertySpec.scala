package graft

import graft.operators.Components
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for incremental connected components: for ANY random
  * edge set split into ANY batch sequence, folding the batches through
  * [[Components.mergePairs]] must equal [[Components.fromPairs]] on
  * the whole edge set. Small id spaces force the hard shapes — chains
  * that merge across batches through brand-new nodes, label decreases
  * arriving late (a new node smaller than every stored min), repeated
  * edges, and batches that only rewire existing components.
  * (Raw scalacheck Gen with fixed seeds; the scalatest bridge artifact
  * isn't in the offline cache.)
  */
class MergePairsPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def edgeCases: Seq[(List[(Long, Long)], Int)] = (1 to 25).map { s =>
    val p = Gen.Parameters.default
    val len = Gen.chooseNum(1, 40).apply(p, Seed(s)).getOrElse(1)
    val edges = Gen.listOfN(len, for {
      a <- Gen.chooseNum(0L, 24L)
      b <- Gen.chooseNum(0L, 24L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
      .apply(p, Seed(s * 104729L)).getOrElse(Nil)
    val cuts = Gen.chooseNum(1, 4).apply(p, Seed(s * 7919L)).getOrElse(2)
    (edges, cuts)
  }

  test("folding random batches through mergePairs == fromPairs on the union") {
    edgeCases.filter(_._1.nonEmpty).foreach { case (edges, nBatches) =>
      val batches = edges.zipWithIndex
        .groupMap(_._2 % nBatches)(_._1).toSeq.sortBy(_._1).map(_._2)
      var labels = Components.fromPairs(
        batches.head.toDF("a_id", "b_id")).localCheckpoint()
      batches.tail.foreach { b =>
        labels = Components.mergePairs(labels,
          b.toDF("a_id", "b_id")).localCheckpoint()
      }
      val incr = labels.as[(Long, Long)].collect().toMap
      val full = Components.fromPairs(edges.toDF("a_id", "b_id"))
        .as[(Long, Long)].collect().toMap
      assert(incr == full,
        s"edges=$edges batches=$nBatches:\n incr=$incr\n full=$full")
    }
  }
}
