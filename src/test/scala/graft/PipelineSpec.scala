package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end curation pipeline over one corpus frame: the operators
  * compose the way a real training-data build runs them —
  * scrub → near-dup pairs → survivor set → stable split — with the
  * invariants a downstream trainer relies on asserted at each joint.
  */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("scrub -> dedup -> survivors -> split composes with coherent invariants") {
    val docs = Tables.docsAug(spark, sf).select(col("doc_id"), col("text"))
    val n = docs.count()

    // 1. scrub (identity-preserving here: corpus is PII-free, so the
    //    pass must be a no-op on content identity)
    val cleaned = operators.Scrub.scrubbedDocs(docs)
    assert(cleaned.select(md5(col("text"))).as[String].collect().toSeq ==
      docs.select(md5(col("text"))).as[String].collect().toSeq)

    // 2. near-dup pairs -> survivors: every doc labeled exactly once
    val pairs = operators.Dedup.minhashPairs(cleaned).select("a_id", "b_id")
    val kept = operators.Dedup.keepFrom(cleaned.select(col("doc_id")), pairs)
    assert(kept.count() == n)
    assert(kept.select("doc_id").distinct().count() == n)

    // 3. injected exact copies must lose to their source
    val copies = kept.filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
    assert(copies.count() > 0 && copies.filter(col("is_kept")).count() == 0)

    // 4. survivors get a stable split; every survivor exactly one row,
    //    and the assignment depends only on doc_id (re-running after
    //    adding docs can't move anyone)
    val survivors = kept.filter(col("is_kept")).select("doc_id")
    val split = survivors
      .withColumn("bucket",
        (conv(substring(md5(concat(lit("split:"), col("doc_id"))), 1, 7), 16, 10)
          .cast("long") % 100))
      .withColumn("split", when(col("bucket") < 80, "train")
        .when(col("bucket") < 90, "val").otherwise("test"))
    assert(split.count() == survivors.count())
    val shares = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(shares.keySet == Set("train", "val", "test"))
    assert(shares("train") > shares("val") && shares("train") > shares("test"))

    // 5. the kept corpus is smaller than the input (dedup did work)
    //    and every survivor is a real input doc
    assert(survivors.count() < n)
    assert(survivors.join(docs, "doc_id").count() == survivors.count())
  }
}
