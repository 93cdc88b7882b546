package graft

import graft.operators.KnnEval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnnEvalSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // two well-separated clusters on orthogonal axes, plus one planted
  // mislabel: its neighbors all carry the OTHER label, so the vote
  // overrules the annotation and its class's accuracy drops exactly
  // by the one query
  private def cluster(ids: Range, label: Int, axis: Int) =
    ids.map { i =>
      val v = Array.fill(4)(0.001f * i)
      v(axis) = 1f
      (i.toLong, v.toSeq, label)
    }

  test("separable clusters score 1.0; a planted mislabel is outvoted") {
    val rows = cluster(0 to 9, 0, 0) ++ cluster(10 to 19, 1, 1) ++
      Seq((20L, Seq(1f, 0.001f, 0f, 0f), 1)) // axis-0 vector labeled 1
    val df = rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("label"))
    // every vector is an eval query
    val out = KnnEval.knnLabelEval(spark, df, df)
      .as[(Long, Long, Long, Double, Double)].collect()
    val byLabel = out.map(r => r._1 -> r).toMap
    // label 0: all 10 queries vote label 0 (the mislabel sits among
    // them but 5 true neighbors outvote it in every query's list)
    assert(byLabel(0L)._2 == 10L && byLabel(0L)._4 == 1.0)
    // label 1: the 10 axis-1 queries are correct; the planted query's
    // neighbors are all label 0, so it is outvoted -> 10/11
    assert(byLabel(1L)._2 == 11L && byLabel(1L)._3 == 10L)
    assert(byLabel(1L)._5 < byLabel(0L)._5,
      "agreement rate must expose the planted mislabel")
  }

  test("vote ties break to the smallest label") {
    // one query at the bisector of two 2-vector clusters: its 4
    // neighbors split 2/2 between labels 3 and 7 — the tie must go to
    // label 3, observed through n_correct under each query labeling
    def fixture(queryLabel: Int) = Seq(
      (0L, Seq(1f, 0f, 0f, 1f), queryLabel),
      (1L, Seq(1f, 0.01f, 0f, 0f), 7),
      (2L, Seq(1f, -0.01f, 0f, 0f), 7),
      (3L, Seq(0f, 0.01f, 0f, 1f), 3),
      (4L, Seq(0f, -0.01f, 0f, 1f), 3))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("label"))
    def correctAs(queryLabel: Int): Long = {
      val df = fixture(queryLabel)
      KnnEval.knnLabelEval(spark, df, df.filter(col("vec_id") === 0L))
        .as[(Long, Long, Long, Double, Double)].head()._3
    }
    assert(correctAs(3) == 1L, "2/2 tie must predict the smaller label 3")
    assert(correctAs(7) == 0L, "and therefore not label 7")
  }
}
