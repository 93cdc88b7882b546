package graft

import graft.operators.{Corpus, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SampleTopWSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("selection equals the sequential A-ES reference draw for draw") {
    val weights = TextAnalysis.qualityScores(spark, sf)
      .select(col("doc_id"), col("quality"))
      .as[(Long, Double)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val h = md.digest(s"aes:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 7), 16)
    }
    val want = weights.filter(_._2 > 0).map { case (id, w) =>
      val u = (bucket(id).toDouble + 0.5) / 268435456.0
      (id, math.floor(1e6 * math.log(u) / w + 0.5).toLong)
    }.sortBy { case (id, r) => (-r, id) }.take(Corpus.TopWN)
      .map { case (id, r) => id -> r }.toSeq
    val got = Corpus.sampleTopW(spark, sf)
      .select(col("doc_id"), col("rank_micro"))
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("exactly N rows; higher weight wins at equal uniform (rank is monotone in w)") {
    val n = Corpus.sampleTopW(spark, sf).count()
    assert(n == math.min(Corpus.TopWN,
      TextAnalysis.qualityScores(spark, sf).filter(col("quality") > 0).count()))
    // monotonicity: same u, larger w → larger (less negative) rank
    val u = 0.3
    def rank(w: Double) = math.floor(1e6 * math.log(u) / w + 0.5)
    assert(rank(0.9) > rank(0.5) && rank(0.5) > rank(0.1))
  }

  test("inclusion rate scales with weight on a planted two-class corpus") {
    // 2000 docs, half weight 0.9, half weight 0.3 → A-ES picks the
    // heavy class at roughly 3x the rate of the light class
    val docs = (1L to 2000L).map(id => (id, if (id % 2 == 0) 0.9 else 0.3))
      .toDF("doc_id", "quality")
    val picked = docs
      .withColumn("bucket",
        conv(substring(md5(concat(lit("aes:"), col("doc_id").cast("string"))), 1, 7), 16, 10)
          .cast("long"))
      .withColumn("rank_micro",
        floor(lit(1e6) * log((col("bucket").cast("double") + 0.5) / 268435456.0)
          / col("quality") + 0.5).cast("long"))
      .orderBy(col("rank_micro").desc, col("doc_id"))
      .limit(400)
      .select(col("doc_id")).as[Long].collect()
    val heavy = picked.count(_ % 2 == 0)
    val light = picked.length - heavy
    assert(heavy > light * 2, s"heavy=$heavy light=$light")
  }
}
