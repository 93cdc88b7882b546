package graft

import graft.operators.Mojibake
import org.scalatest.funsuite.AnyFunSuite

class MojibakeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def rowOf(t: String): Map[String, Any] = {
    val r = Mojibake.screen(Seq((1L, t)).toDF("doc_id", "t")).collect().head
    r.schema.fieldNames.zip(r.toSeq).toMap
  }

  test("clean ascii text carries zero signals") {
    val got = rowOf("perfectly fine text, with tab\tand newline\n")
    assert(got("n_fffd") == 0L && got("n_double") == 0L && got("n_ctrl") == 0L)
    assert(got("bad_micro") == 0L)
    assert(got("corrupt") == false)
  }

  test("each signature counts exactly; tab/LF/CR never flag") {
    assert(rowOf("na�ve te�t")("n_fffd") == 2L)
    assert(rowOf("mÃ©rge Ã¼ber")("n_double") == 2L)
    assert(rowOf("key\tok\r\nend")("n_ctrl") == 2L)
  }

  test("'Ã' before plain ascii is NOT double-encoding (real word, not mojibake)") {
    // 'Ãx' has no continuation-byte follower — e.g. Portuguese 'LÃ' +
    // ascii would be a false positive if the class were unanchored
    val got = rowOf("Ãx and Ã at end: Ã")
    assert(got("n_double") == 0L)
    assert(got("corrupt") == false)
  }

  test("severity counts characters destroyed per hit") {
    // 1 fffd (weight 2) + 1 double pair (2 chars) + 1 ctrl = 5 of 10 chars
    val t = "\u0001aÃ©b�cdef" // 10 chars
    val got = rowOf(t)
    assert(got("n_fffd") == 1L && got("n_double") == 1L && got("n_ctrl") == 1L)
    assert(got("bad_micro") == (5L * 1000000L) / 10L)
    assert(got("corrupt") == true)
  }

  test("fixture plants all three signals with overlap at sf0.001") {
    val rows = Mojibake.mojibake(spark, "/root/testdata/sf0.001").collect()
    def n(f: String) = rows.count(_.getAs[Long](f) > 0L)
    assert(n("n_fffd") > 0 && n("n_double") > 0 && n("n_ctrl") > 0)
    val corrupt = rows.count(_.getAs[Boolean]("corrupt"))
    assert(corrupt > 0 && corrupt < rows.length)
    // doc 0 hits every modulus: all three signals on one doc
    val d0 = rows.find(_.getLong(0) == 0L).get
    assert(d0.getAs[Long]("n_double") > 0L && d0.getAs[Long]("n_ctrl") > 0L)
  }
}
