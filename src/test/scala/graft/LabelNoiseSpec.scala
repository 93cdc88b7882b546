package graft

import graft.operators.{Corpus, NaiveBayes}
import org.scalatest.funsuite.AnyFunSuite

class LabelNoiseSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("planted label flips are caught; clean labels are not flagged") {
    // disjoint vocabularies -> a confidently separable corpus; flip the
    // recorded label on a known slice of scored code docs
    val code = Seq("parse", "compile", "lambda", "pointer")
    val prose = Seq("river", "garden", "winter", "melody")
    val M = Corpus.EvalMod
    val rows = (0 until 900).map { i =>
      val isCode = i % 2 == 0
      val words = if (isCode) code else prose
      val text = (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
        .mkString(" ")
      // flip every 9th SCORED code doc's label (train slice stays clean
      // so the model learns the true classes)
      val flipped = isCode && i % M != 0 && i % 9 == 0
      (i.toLong, if (flipped) "prose" else if (isCode) "code" else "prose",
        text)
    }
    val scored = NaiveBayes.classify(rows.toDF("doc_id", "lang", "text"))
      .withColumnRenamed("label", "lang")
    val r = NaiveBayes.labelNoiseOf(scored).collect()
      .map(x => x.getAs[String]("lang") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("n_suspect"),
          Option(x.getAs[String]("top_confused"))))).toMap
    val flips = rows.count { case (i, l, _) => l == "prose" && i % 2 == 0 }
    assert(flips > 20, s"fixture sanity: $flips flips")
    // every flipped doc reads as confident code -> suspect under 'prose',
    // pointing at 'code'; genuine prose docs are never flagged
    val (nProse, susProse, topProse) = r("prose")
    assert(susProse == flips.toLong,
      s"all $flips flips (and nothing else) flagged: $r")
    assert(topProse.contains("code"), s"flips point at the true class: $r")
    assert(r("code")._2 == 0L, s"clean code labels unflagged: $r")
    assert(nProse > flips.toLong, "prose bucket also holds genuine docs")
  }
}
