package graft

import graft.operators.CorpusStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DomainEntropySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def lnMicro(c: Long): Long = math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong
  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("sequential micro-nat recount parity on the corpus") {
    val docs = Tables.documents(spark, sf)
    val got = CorpusStats.domainEntropy(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_terms"),
          r.getAs[Double]("entropy"))).toMap

    val tf = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.select(col("source"), col("text")).collect().foreach { r =>
      val src = r.getString(0)
      r.getString(1).split(" ").filter(_.nonEmpty)
        .foreach(t => tf((src, t)) = tf.getOrElse((src, t), 0L) + 1L)
    }
    val bySrc = tf.groupBy(_._1._1)
    assert(got.keySet == bySrc.keySet)
    for ((src, m) <- bySrc) {
      val n = m.values.sum
      val v = m.size.toLong
      val num = n * lnMicro(n) - m.values.map(c => c * lnMicro(c)).sum
      val (gn, gv, gh) = got(src)
      assert(gn == n && gv == v, src)
      assert(gh == r6(num.toDouble / (n.toDouble * 1e6)), src)
    }
  }

  test("uniform distribution is maximally even; single-term source degenerates to 0 / null") {
    val docs = Seq(
      ("u1", "a b c d", "uni"), ("u2", "e f g h", "uni"),
      ("m1", "x x x x x x x", "mono"),
      ("s1", "t t t t t t y z", "skew"))
      .toDF("doc_id", "text", "source")
    val r = CorpusStats.domainEntropy(docs).collect()
      .map(x => x.getAs[String]("source") -> x).toMap

    // 8 distinct terms once each: H = ln 8, evenness = 1 (within micro rounding)
    assert(math.abs(r("uni").getAs[Double]("entropy") - math.log(8.0)) < 1e-5)
    assert(math.abs(r("uni").getAs[Double]("evenness") - 1.0) < 1e-5)
    // one term: entropy exactly 0, evenness null (ln V = 0 guard)
    assert(r("mono").getAs[Double]("entropy") == 0.0)
    assert(r("mono").isNullAt(r("mono").fieldIndex("evenness")))
    // skewed source sits strictly between: positive but far from even
    val sk = r("skew").getAs[Double]("evenness")
    assert(sk > 0.0 && sk < 0.75, sk)
  }

  test("entropy ranks balance where TTR cannot: template mass collapses evenness") {
    // same vocabulary size, same token count; one source balanced, one template-heavy
    val bal = ("b1", Array.fill(4)(Seq("p", "q", "r", "s")).flatten.mkString(" "), "bal")
    val tpl = ("t1", (Seq.fill(13)("p") ++ Seq("q", "r", "s")).mkString(" "), "tpl")
    val docs = Seq(bal, tpl).toDF("doc_id", "text", "source")
    val r = CorpusStats.domainEntropy(docs).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("bal").getAs[Long]("n_terms") == r("tpl").getAs[Long]("n_terms"))
    assert(r("bal").getAs[Long]("n_tokens") == r("tpl").getAs[Long]("n_tokens"))
    assert(r("bal").getAs[Double]("entropy") > r("tpl").getAs[Double]("entropy"))
  }
}
