package graft

import graft.operators.NaiveBayes
import graft.streaming.StreamingNbClassify
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NaiveBayesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // Separable two-class corpus: class "code" draws from one vocabulary,
  // class "prose" from a disjoint one. doc_id % 97 == 0 rows land in
  // the train slice (EvalMod convention).
  private def corpus = {
    val code = Seq("parse", "compile", "lambda", "pointer", "stack",
      "heap", "mutex", "socket")
    val prose = Seq("river", "garden", "winter", "melody", "journey",
      "harvest", "lantern", "meadow")
    val rows = (0 until 400).map { i =>
      val words = if (i % 2 == 0) code else prose
      val text = (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
        .mkString(" ")
      (i.toLong, if (i % 2 == 0) "code" else "prose", text)
    }
    rows.toDF("doc_id", "lang", "text")
  }

  test("disjoint-vocabulary classes separate perfectly with positive margins") {
    val out = NaiveBayes.classify(corpus).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(3) == r.getString(1),
        s"doc ${r.getLong(0)}: pred ${r.getString(3)} != ${r.getString(1)}")
      assert(r.getLong(5) > 0L, "separable classes must score with a gap")
    }
  }

  test("calibration: confident bands are accurate on signal, noise lands low and near chance") {
    // signal docs draw from disjoint vocabularies (high margin, correct);
    // noise docs share ONE vocabulary across both labels (margin ~0,
    // accuracy ~half) — the reliability curve must separate them
    val code = Seq("parse", "compile", "lambda", "pointer")
    val prose = Seq("river", "garden", "winter", "melody")
    val shared = Seq("thing", "stuff", "item", "word")
    val rows = (0 until 800).map { i =>
      val signal = i < 400
      val words = if (signal) { if (i % 2 == 0) code else prose } else shared
      val text = (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
        .mkString(" ")
      (i.toLong, if (i % 2 == 0) "code" else "prose", text)
    }
    val scored = NaiveBayes.classify(rows.toDF("doc_id", "lang", "text"))
    val cal = NaiveBayes.calibration(scored, "label").collect()
    assert(cal.map(_.getAs[Long]("n_docs")).sum == scored.count())
    val byBand = cal.map(r => r.getAs[Long]("band") ->
      (r.getAs[Long]("n_docs"), r.getAs[Double]("acc_r6"))).toMap
    val top = byBand(byBand.keys.max)
    val bottom = byBand(byBand.keys.min)
    assert(top._2 > 0.95, s"confident band accurate: $top")
    assert(bottom._2 < 0.7, s"low-margin band near chance: $bottom")
  }

  test("merged incremental counts equal one-shot counts exactly") {
    val a = corpus.filter(col("doc_id") < 200)
    val b = corpus.filter(col("doc_id") >= 200)
    val merged = NaiveBayes.mergeCounts(
      NaiveBayes.counts(a), NaiveBayes.counts(b))
      .as[(String, Long, Long)].collect().toSet
    val oneShot = NaiveBayes.counts(corpus)
      .as[(String, Long, Long)].collect().toSet
    assert(merged == oneShot)
  }

  test("a class absent from the train slice survives on pure smoothing") {
    // "ghost" never hits doc_id % 97 == 0, so it trains on zero docs
    val ghost = corpus
      .withColumn("lang", when(col("doc_id") === 1L, lit("ghost"))
        .otherwise(col("lang")))
    val out = NaiveBayes.classify(ghost)
    assert(out.count() > 0)
    assert(out.filter(col("doc_id") === 1L).count() == 1,
      "the ghost-labeled doc still gets scored")
  }

  test("scoring rides the scan: no exchange, no join") {
    val model = NaiveBayes.fit(
      NaiveBayes.counts(corpus.filter(col("doc_id") % 97 === 0)),
      Seq("code", "prose"))
    val plan = NaiveBayes.scoreWith(corpus, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"scoring must be a pure projection, got:\n$plan")
  }

  test("streamed classification equals batch bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    val model = NaiveBayes.fit(
      NaiveBayes.counts(corpus.filter(col("doc_id") % 97 === 0)),
      Seq("code", "prose"))
    val eval = corpus.filter(col("doc_id") % 97 =!= 0)
    val batch = NaiveBayes.scoreWith(eval, model)
      .as[(Long, String, Long, String, Long, Long)].collect().toSet

    val rows = eval.select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()
    val (m1, m2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingNbClassify(
      mem.toDF().toDF("doc_id", "lang", "text"), model)
      .writeStream.format("memory").queryName("nb_t")
      .outputMode("append").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("nb_t")
      .as[(Long, String, Long, String, Long, Long)].collect().toSet
    assert(streamed == batch)
  }
}
