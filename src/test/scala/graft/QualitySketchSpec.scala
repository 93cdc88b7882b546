package graft

import graft.operators.{QualitySketch, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySketchSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private lazy val sig = TextAnalysis.filterSignals(
    Tables.documents(spark, sf).select(col("doc_id"), col("source"), col("text")),
    passthrough = Seq("source")).cache()

  private def collectSketch(df: DataFrame): Map[(String, Int), Long] =
    df.select(col("source"), col("bin"), col("cnt"))
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("batch sketches merge to exactly the whole-corpus sketch, any order") {
    val parts = Seq(
      sig.filter(col("doc_id") % 3 === 0),
      sig.filter(col("doc_id") % 3 === 1),
      sig.filter(col("doc_id") % 3 === 2))
    val whole = collectSketch(QualitySketch.fromSignals(sig))
    val merged = collectSketch(
      parts.map(QualitySketch.fromSignals).reduce(QualitySketch.merge))
    val mergedRev = collectSketch(
      parts.reverse.map(QualitySketch.fromSignals).reduce(QualitySketch.merge))
    assert(whole.nonEmpty && whole.values.sum == sig.count())
    assert(merged == whole, "incremental merge must equal the one-shot sketch")
    assert(mergedRev == whole, "merge must be order-insensitive")
  }

  test("sketch thresholds track the exact ranked-window medians within one bin") {
    val exact = TextAnalysis.domainThresholds(sig)
      .as[(String, Double)].collect().toMap
    val est = QualitySketch.threshold(QualitySketch.fromSignals(sig))
      .as[(String, Double)].collect().toMap
    assert(exact.nonEmpty && est.keySet == exact.keySet)
    exact.foreach { case (src, q) =>
      assert(math.abs(est(src) - q) <= 1.0 / QualitySketch.Bins,
        s"$src: sketch ${est(src)} vs exact $q exceeds one bin width")
    }
  }

  test("sketch-derived calibration drives the same filter machinery") {
    val thresholds = QualitySketch.threshold(QualitySketch.fromSignals(sig))
    val kept = sig.join(broadcast(thresholds), "source")
      .filter(col("quality") >= col("q50") && col("is_en") &&
        col("dup_fraction") <= 0.2)
      .count()
    val keptExact = sig.join(
      broadcast(TextAnalysis.domainThresholds(sig)), "source")
      .filter(col("quality") >= col("q50") && col("is_en") &&
        col("dup_fraction") <= 0.2)
      .count()
    // one-bin threshold error can only move docs whose quality sits
    // inside that bin — a sliver of each domain
    val drift = math.abs(kept - keptExact).toDouble / keptExact
    assert(kept > 0 && drift <= 0.05,
      s"sketch calibration keep-count drifted $drift (kept $kept vs $keptExact)")
  }
}
