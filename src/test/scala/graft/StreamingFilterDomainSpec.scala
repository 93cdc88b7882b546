package graft

import graft.operators.TextAnalysis
import graft.streaming.StreamingFilterDomain
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingFilterDomainSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("streamed per-domain filter equals batch q_filter_domain under the same calibration") {
    implicit val sqlCtx = spark.sqlContext
    val batch = TextAnalysis.filterDomain(spark, sf)
      .as[(Long, String, Double, Double, Boolean)].collect().toSet
    assert(batch.nonEmpty && batch.exists(_._5) && batch.exists(!_._5))

    // calibration stored offline from the same corpus the batch run saw
    val thresholds = TextAnalysis.domainThresholds(
      TextAnalysis.filterSignals(
        Tables.documents(spark, sf).select(col("doc_id"), col("source"), col("text")),
        passthrough = Seq("source"))).cache()

    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val (m1, m2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingFilterDomain(
      mem.toDF().toDF("doc_id", "source", "text"), thresholds)
      .writeStream.format("memory").queryName("sfd_t")
      .outputMode("append").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sfd_t")
      .as[(Long, String, Double, Double, Boolean)].collect().toSet
    assert(streamed == batch,
      s"stream/batch keep decisions diverge (e.g. ${(streamed -- batch).take(3)})")
  }

  test("sketch-derived calibration drives the stream: the full incremental loop composes") {
    import graft.operators.QualitySketch
    implicit val sqlCtx = spark.sqlContext
    // calibration refreshed the INCREMENTAL way: batch sketches merged,
    // thresholds read from the merged sketch (never rescanning old docs)
    val sig = TextAnalysis.filterSignals(
      Tables.documents(spark, sf).select(col("doc_id"), col("source"), col("text")),
      passthrough = Seq("source"))
    val sketch = Seq(
      sig.filter(col("doc_id") % 2 === 0),
      sig.filter(col("doc_id") % 2 === 1))
      .map(QualitySketch.fromSignals).reduce(QualitySketch.merge)
    val thresholds = QualitySketch.threshold(sketch).cache()

    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingFilterDomain(
      mem.toDF().toDF("doc_id", "source", "text"), thresholds)
      .writeStream.format("memory").queryName("sfd_sk")
      .outputMode("append").start()
    try {
      mem.addData(rows.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sfd_sk")
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    // reference: the same decision rule against the sketch thresholds
    // in batch — stream and batch must agree exactly under the SAME
    // calibration table
    val batch = sig.join(broadcast(thresholds), "source")
      .select(col("doc_id"),
        (col("quality") >= col("q50") && col("is_en") &&
          col("dup_fraction") <= 0.2).as("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(streamed.nonEmpty && streamed == batch)
    // and the sketch calibration stays close to the exact one end-to-end
    val exactKeep = TextAnalysis.filterDomain(spark, sf)
      .select(col("doc_id"), col("keep")).as[(Long, Boolean)].collect().toMap
    val agree = streamed.count { case (id, kp) => exactKeep(id) == kp }
    assert(agree.toDouble / streamed.size >= 0.95,
      s"sketch-calibrated stream agrees with exact calibration on $agree/${streamed.size}")
  }

  test("a source unseen at calibration time falls back to the global cutoff") {
    implicit val sqlCtx = spark.sqlContext
    val thresholds = Seq(("known", 0.9)).toDF("source", "q50")
    // ~50 distinct English tokens, no punctuation, no repeated shingles:
    // quality lands well inside (0.5, 0.9) so the two cutoffs disagree
    val text = "the quick brown fox jumps over the lazy dog while a small " +
      "red bird sings near the old stone bridge and children play beside " +
      "the calm blue river as the warm summer wind moves through tall " +
      "green trees carrying soft white clouds across the bright open sky " +
      "toward distant hills"
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingFilterDomain(
      mem.toDF().toDF("doc_id", "source", "text"), thresholds)
      .writeStream.format("memory").queryName("sfd_nk")
      .outputMode("append").start()
    try {
      mem.addData((1L, "known", text), (2L, "brand_new", text))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sfd_nk")
      .select("doc_id", "q50", "keep")
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == 0.9, "calibrated source must use its stored threshold")
    assert(out(2L)._1 == StreamingFilterDomain.GlobalCutoff,
      "unseen source must fall back to the global cutoff")
    // same doc, same quality: the calibrated source's stricter bar drops it
    assert(!out(1L)._2 && out(2L)._2,
      s"per-domain threshold must drive the keep decision, got $out")
  }
}
