package graft

import graft.operators.CodeStats
import org.scalatest.funsuite.AnyFunSuite

class CodeStatsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def rowOf(body: String): Map[String, Any] = {
    val r = CodeStats.statsOf(Seq((1L, body)).toDF("doc_id", "body"))
      .collect().head
    r.schema.fieldNames.zip(r.toSeq).toMap
  }

  test("hand-computed census on a known body") {
    // 4 lines: lens 9, 6, 11, 0; one comment, one indented
    val body = "# license\nx = 1 \n    indent!\n"
    val got = rowOf(body)
    assert(got("n_lines") == 4L) // trailing newline yields an empty line
    assert(got("max_line") == 11L)
    assert(got("avg_line_micro") == (26L * 1000000L) / 4L)
    assert(got("comment_micro") == 250000L)
    assert(got("indent_micro") == 250000L)
    // alnum: "license"(7) + "x"(1) + "1"(1) + "indent"(6) = 15 of 29 chars
    assert(got("alnum_micro") == (15L * 1000000L) / 29L)
    assert(got("keep") == false) // alnum 0.5 < 0.8 floor
  }

  test("keep thresholds: clean body passes, kilometer line fails") {
    val clean = "goodcode1\ngoodcode2\ngoodcode3"
    assert(rowOf(clean)("keep") == true)
    val minified = "goodcode1\n" + ("x" * 200) // max_line 200 > 45
    assert(rowOf(minified)("keep") == false)
    val allComments = "# a\n# b\n# c\n# d" // comment_micro = 1e6
    assert(rowOf(allComments)("keep") == false)
  }

  test("empty body is total: one empty line, zero ratios, no divide-by-zero") {
    val got = rowOf("")
    assert(got("n_lines") == 1L)
    assert(got("max_line") == 0L)
    assert(got("avg_line_micro") == 0L)
    assert(got("alnum_micro") == 0L)
  }

  test("domain rollup is consistent with the per-doc census") {
    val perDoc = CodeStats.codeStats(spark, "/root/testdata/sf0.001").collect()
    val docs = graft.Tables.codeDocs(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rolled = CodeStats.codeDomain(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r).toMap
    val bySrc = perDoc.groupBy(r => docs(r.getLong(0)))
    assert(rolled.keySet == bySrc.keySet)
    for ((src, rs) <- bySrc) {
      val g = rolled(src)
      assert(g.getAs[Long]("n_docs") == rs.length.toLong, s"$src n")
      assert(g.getAs[Long]("n_keep") ==
        rs.count(_.getAs[Boolean]("keep")).toLong, s"$src keep")
      assert(g.getAs[Long]("keep_micro") ==
        rs.count(_.getAs[Boolean]("keep")).toLong * 1000000L / rs.length,
        s"$src rate")
      assert(g.getAs[Long]("max_line") ==
        rs.map(_.getAs[Long]("max_line")).max, s"$src max")
    }
  }

  test("fixture plants real variation at sf0.001: comments exist, keep splits") {
    val df = CodeStats.codeStats(spark, "/root/testdata/sf0.001").collect()
    assert(df.length > 0)
    val commented = df.count(_.getAs[Long]("comment_micro") > 0L)
    val kept = df.count(_.getAs[Boolean]("keep"))
    assert(commented > 0 && commented < df.length)
    assert(kept > 0 && kept < df.length)
  }
}
