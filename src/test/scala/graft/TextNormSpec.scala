package graft

import graft.operators.TextNorm
import graft.functions.NfcNormalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextNormSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("NFC composes decomposed sequences; ASCII and composed are fixpoints") {
    val rows = Seq(
      (1L, "café"),        // e + combining acute -> é
      (2L, "café"),         // already composed
      (3L, "plain ascii only"),
      (4L, "naïve mix")    // i + combining diaeresis -> ï
    ).toDF("doc_id", "text")
    val r = rows.select(col("doc_id"), NfcNormalize.nfc(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "café")
    assert(r(2L) == "café")
    assert(r(3L) == "plain ascii only")
    assert(r(4L) == "naïve mix")
  }

  test("normalization unifies the exact-dedup hash of equivalent texts") {
    val rows = Seq((1L, "café menu"), (2L, "café menu"))
      .toDF("doc_id", "text")
    val hashes = TextNorm.nfcReport(rows)
      .select("norm_hash").as[String].collect()
    assert(hashes.distinct.length == 1,
      "NFC-equal texts must hash identically after normalization")
    val rawHashes = rows.select(md5(col("text"))).as[String].collect()
    assert(rawHashes.distinct.length == 2,
      "without NFC the same text hashes differently — the defect NFC fixes")
  }

  test("report fields: changed flag and length contraction") {
    val rows = Seq((1L, "café"), (2L, "abc")).toDF("doc_id", "text")
    val r = TextNorm.nfcReport(rows)
      .as[(Long, Boolean, Long, Long, String)].collect().map(x => x._1 -> x).toMap
    assert(r(1L)._2 && r(1L)._3 == 5L && r(1L)._4 == 4L)
    assert(!r(2L)._2 && r(2L)._3 == 3L && r(2L)._4 == 3L)
  }

  test("script profile counts and dominant script per injection class") {
    val r = TextNorm.scriptMix(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    assert(r.nonEmpty)
    r.foreach { case (id, latin, cyr, greek, cjk, _, main) =>
      assert(latin > 0, s"doc $id: fixture text is Latin word soup")
      if (id % 4 == 1) assert(cyr > 0, s"doc $id missing Cyrillic")
      if (id % 4 == 2) assert(cjk > 0, s"doc $id missing CJK")
      if (id % 4 == 3) assert(greek > 0, s"doc $id missing Greek")
      assert(main == "latin", s"doc $id: Latin bulk must dominate")
    }
  }

  test("nfc expression stays inside whole-stage codegen") {
    // parquet-backed scan (a literal Seq constant-folds to a
    // LocalTableScan with no codegen stage at all)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val plan = TextNorm.nfcReport(docs).queryExecution.executedPlan
    val stages = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.nonEmpty, plan.toString)
    // the nfc projection itself must sit INSIDE a codegen stage (a
    // CodegenFallback expression would split the stage around it)
    assert(stages.exists(_.toString.contains("nfcnormalizeexpr")),
      plan.toString)
  }
}
