package graft

import graft.functions.WinnowFps
import graft.operators.TextAnalysis.{K, W}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WinnowFpsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The composed HOF chain the kernel fuses — the shape the oracle
    * SQL mirrors (md5 top-28 per char k-gram, array_min per w-window,
    * array_distinct). Persist-barriered as the operators were before
    * the kernel existed.
    */
  private def composed(k: Int, w: Int) = {
    val kgramHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      g => conv(substring(md5(g), 1, 7), 16, 10).cast("long")
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"), transform(
        sequence(lit(1), length(col("text")) - (k - 1)),
        i => kgramHash(col("text").substr(i, lit(k)))).as("h"))
      .persist()
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), size(col("h")) - (w - 1)),
        i => array_min(slice(col("h"), i, lit(w))))).as("fps"))
  }

  test("bit-parity with the composed md5 winnowing chain on the corpus") {
    val native = Tables.documents(spark, sf)
      .filter(length(col("text")) >= K + W - 1)
      .select(col("doc_id"), WinnowFps(col("text"), K, W).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ref = composed(K, W)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native.keySet == ref.keySet)
    // full sequence equality: same values, same first-occurrence order
    for ((id, fps) <- ref) assert(native(id) == fps, s"doc $id")
  }

  test("degenerate lengths: shorter than one window is empty, exactly one window is one fp") {
    import spark.implicits._
    val df = Seq((1L, "ab"), (2L, "a" * (K + W - 2)), (3L, "b" * (K + W - 1)))
      .toDF("doc_id", "text")
      .select(col("doc_id"), WinnowFps(col("text"), K, W).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(df(1L).isEmpty && df(2L).isEmpty)
    assert(df(3L).length == 1)
  }
}
