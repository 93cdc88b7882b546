package graft

import graft.functions.{SigExprs, TextSim}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SigExprsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def paired = Tables.documents(spark, sf)
    .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
    .filter(size(col("t")) >= 3)
    .select(col("doc_id"), TextSim.shingles3(col("t")).as("sh"))
    .withColumn("pairs", TextSim.hashPairs(col("sh")))
    .persist()

  test("minhash_sig / simhash48 are SQL-callable via GraftExtensions") {
    paired.createOrReplaceTempView("paired_sql_t")
    val viaSql = spark.sql(
      """SELECT doc_id, minhash_sig(pairs) AS sig, simhash48(pairs) AS sh
        |FROM paired_sql_t""".stripMargin)
      .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val viaApi = paired.select(col("doc_id"),
      SigExprs.minhashSig(col("pairs")).as("sig"),
      SigExprs.simhash48(col("pairs")).as("sh"))
      .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(viaSql == viaApi && viaSql.nonEmpty)
  }

  test("native hash pairs equal the hex-string HOF form on the corpus") {
    val both = Tables.documents(spark, sf)
      .select(col("doc_id"), TextSim.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(
        SigExprs.hashPairs(col("t")).as("native"),
        TextSim.hashPairs(col("t")).as("hof"))
      .as[(Seq[(Long, Long)], Seq[(Long, Long)])].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) => assert(n == h) }
  }

  test("native minhash signature equals the HOF form on the corpus") {
    val both = paired.select(
      SigExprs.minhashSig(col("pairs")).as("native"),
      TextSim.minhashSigFromPairs(col("pairs")).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) => assert(n == h) }
  }

  test("native simhash48 equals the HOF form on the corpus") {
    val both = paired.select(
      SigExprs.simhash48(col("pairs")).as("native"),
      TextSim.simhash48FromPairs(col("pairs")).as("hof"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) => assert(n == h) }
  }

  test("native hyperplane bits equal the unrolled sum form on real vectors") {
    import graft.operators.Ann
    val e = Tables.embeddings(spark, sf)
    val unrolled = array(Ann.Coefs.map { row =>
      val proj = row.zipWithIndex.map { case (c, i) =>
        val x = element_at(col("embedding"), i + 1).cast("double")
        if (c > 0) x else -x
      }.reduce(_ + _)
      when(proj >= 0, lit(1L)).otherwise(lit(0L))
    }.toIndexedSeq: _*)
    val both = e.select(
      graft.functions.HyperplaneBits(col("embedding"), Ann.Coefs).as("native"),
      unrolled.as("flat"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, f) => assert(n == f) }
  }

  test("native signatures survive whole-stage codegen") {
    val plan = paired.select(SigExprs.simhash48(col("pairs")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen:\n$plan")
  }
}
