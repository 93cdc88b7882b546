package graft

import graft.operators.{Auc, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AucSpec extends AnyFunSuite {
  import SparkTestSession._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("AUC bounds hold and the brute pairwise probability matches exactly") {
    val got = Auc.aucQuery(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.values.forall { case (_, _, a) => a >= 0.0 && a <= 1.0 })

    // brute definition: P(pos > neg) + P(pos = neg)/2, counted pairwise
    val docs = Tables.documents(spark, sf)
    val scored = TextAnalysis.qualityScoresOf(docs)
      .select(col("doc_id"),
        floor(col("quality") * 1e6 + 0.5).cast("long").as("sm"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("sm")))
    for ((src, (nP, nN, auc)) <- got) {
      val pos = scored.filter(_._1 == src).map(_._2)
      val neg = scored.filter(_._1 != src).map(_._2)
      assert(pos.length.toLong == nP && neg.length.toLong == nN, src)
      // O(n²) on the fixture — exact in 2x units
      var wins2 = 0L
      for (p <- pos; n <- neg)
        wins2 += (if (p > n) 2L else if (p == n) 1L else 0L)
      assert(auc == r6(wins2.toDouble / (2.0 * pos.length * neg.length)), src)
    }
  }
}
