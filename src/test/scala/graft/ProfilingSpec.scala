package graft

import graft.operators.{Analytics, FdProfile, Trending}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trending terms, FD profiling, and the equi-depth histogram — the
  * round-5 profiling/monitoring block.
  */
class ProfilingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("trending: powers-of-two decay ranks a recent burst over a steady hum") {
    // 'hum' appears once every day (score Σ2^d = 127); 'burst' appears
    // 5 times on the last day only (score 5·2^6 = 320)
    val docs = ((0 until 7).map(day => (day, Seq("hum"))) ++
      Seq((6, Seq("burst", "burst", "burst", "burst", "burst"))))
      .toDF("day", "t")
    val got = Trending.report(docs)
      .select(col("term"), col("score"), col("n_recent"), col("n_total"))
      .as[(String, Long, Long, Long)].collect()
    assert(got.head == (("burst", 320L, 5L, 5L)), got.mkString(","))
    assert(got(1) == (("hum", 127L, 2L, 7L)))
  }

  test("trending: sequential recount parity on the corpus head") {
    val got = Trending.trending(spark, sf)
      .select(col("term"), col("score")).as[(String, Long)].collect()
    val rows = Tables.documents(spark, sf)
      .select((col("doc_id") % Trending.Days).cast("int"),
        graft.functions.TextSim.tokens(col("text")))
      .as[(Int, Seq[String])].collect()
    val scores = scala.collection.mutable.Map.empty[String, Long]
    for ((day, toks) <- rows; t <- toks)
      scores(t) = scores.getOrElse(t, 0L) + (1L << day)
    val wantHead = scores.toSeq.sortBy { case (t, sc) => (-sc, t) }
      .take(Trending.TopK)
    assert(got.toSeq == wantHead)
  }

  test("fd profile: exact keys hold, noisy dependencies report their violation mass") {
    val m = Seq(
      (1L, "a", "en"), (2L, "a", "en"), (3L, "a", "de"),
      (4L, "b", "fr"), (5L, "b", "fr"))
      .toDF("doc_id", "source", "lang")
    val key = FdProfile.profile(m, "doc_id", "source")
      .select(col("holds"), col("viol_rows")).as[(Boolean, Long)].head()
    assert(key == ((true, 0L)), "a key determines everything")
    val noisy = FdProfile.profile(m, "source", "lang")
      .select(col("n_groups"), col("viol_groups"), col("viol_rows"),
        col("holds")).as[(Long, Long, Long, Boolean)].head()
    // source a maps to {en:2, de:1} -> 1 violating group, 1 row beyond majority
    assert(noisy == ((2L, 1L, 1L, false)), noisy.toString)
  }

  test("fd profile on the corpus: the key FD holds, the metadata FDs do not") {
    val got = FdProfile.fdProfile(spark, sf)
      .select(col("fd"), col("holds")).as[(String, Boolean)].collect().toMap
    assert(got("doc_id->source"), "doc_id is a key")
    assert(!got("source->lang"), "sources are multilingual in the fixture")
  }

  test("equi-depth: bucket sizes within 1 of n/B; bounds nest and cover") {
    val out = Analytics.equidepth(spark, sf)
      .select(col("event_type"), col("bucket"), col("n_rows"), col("lo"),
        col("hi"))
      .as[(String, Int, Long, Double, Double)].collect()
    val byType = out.groupBy(_._1)
    byType.foreach { case (et, rows) =>
      val n = rows.map(_._3).sum
      val b = rows.length
      assert(b == Analytics.EqDepthBuckets)
      assert(rows.forall(r => math.abs(r._3 - n.toDouble / b) <= 1),
        s"$et bucket sizes off equal mass: ${rows.map(_._3).mkString(",")}")
      val sorted = rows.sortBy(_._2)
      sorted.foreach(r => assert(r._4 <= r._5, s"$et bucket ${r._2} lo > hi"))
      sorted.sliding(2).foreach {
        case Array(a, c) => assert(a._5 <= c._4,
          s"$et buckets ${a._2},${c._2} overlap: hi ${a._5} > lo ${c._4}")
        case _ =>
      }
    }
  }
}
