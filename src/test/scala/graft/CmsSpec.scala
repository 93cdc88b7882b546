package graft

import graft.functions.Cms
import graft.operators.DupScore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CmsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // Zipf-ish gram stream: gram i appears ~1000/(i+1) times.
  private def grams = (0 until 200).flatMap(i =>
    Seq.fill(1000 / (i + 1))(s"gram token number $i"))

  private def trueCounts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("never undercounts: every estimate >= the true count") {
    val sk = Cms.fit(grams.toDF("g"), "g")
    trueCounts.foreach { case (g, c) =>
      assert(sk.estimate(g) >= c, s"undercount on $g")
    }
  }

  test("overcount bounded: errors stay within a few eps*N") {
    val sk = Cms.fit(grams.toDF("g"), "g")
    val n = grams.size.toLong
    val eps = math.E / sk.width // CM guarantee: err <= eps*N w.p. 1-e^-depth
    val errs = trueCounts.map { case (g, c) => sk.estimate(g) - c }
    assert(errs.count(_ > (eps * n).ceil.toLong) <= trueCounts.size / 10,
      "more than 10% of grams exceed the one-sided eps*N bound")
  }

  test("merged partial sketches equal the one-shot sketch counter for counter") {
    val (a, b) = grams.splitAt(grams.size / 3)
    val merged = Cms.fit(a.toDF("g"), "g").merge(Cms.fit(b.toDF("g"), "g"))
    val oneShot = Cms.fit(grams.toDF("g"), "g")
    assert(merged.total == oneShot.total)
    for (r <- 0 until oneShot.depth)
      assert(merged.rows(r).sameElements(oneShot.rows(r)), s"row $r differs")
  }

  test("cms census: per-source grouped fit merges to the direct corpus fit") {
    val rows = DupScore.cmsCensus(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == Cms.Depth)
    assert(rows.forall(_.getLong(4) == 0L), "merge mismatch on some row")
    // every sketch row sees every shingle occurrence once
    assert(rows.map(_.getLong(2)).distinct.length == 1, "row mass differs")
    assert(rows.forall(_.getLong(1) > 0L), "a row with zero buckets hit")
    assert(rows.forall(r => r.getLong(3) <= r.getLong(2)))
  }

  test("column estimates equal the driver-side point estimates") {
    val sk = Cms.fit(grams.toDF("g"), "g")
    val sample = trueCounts.keys.toSeq.sorted
    val viaCol = Seq(Tuple1(sample)).toDF("gs")
      .select(Cms.estimates(col("gs"), sk).as("e"))
      .as[Seq[Long]].head()
    sample.zip(viaCol).foreach { case (g, e) =>
      assert(e == sk.estimate(g), s"codegen/driver mismatch on $g")
    }
  }

  test("dup score: an injected template family scores ~family size, unique docs ~1") {
    val unique = (0 until 60).map(i =>
      (i.toLong, s"unique${i}a unique${i}b unique${i}c unique${i}d unique${i}e"))
    val template = (100 until 130).map(i =>
      (i.toLong, "the same boilerplate template text repeated everywhere verbatim"))
    val docs = (unique ++ template).toDF("doc_id", "text")
    val out = DupScore.scoreWith(docs, DupScore.fitCorpus(docs))
      .select("doc_id", "dup_score").as[(Long, Double)].collect().toMap
    unique.foreach { case (id, _) =>
      assert(out(id) <= 2.0, s"unique doc $id scored ${out(id)}")
    }
    template.foreach { case (id, _) =>
      assert(out(id) >= 30.0, s"template doc $id scored ${out(id)} < family size")
    }
  }

  test("streamed dup scoring equals batch bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    val sk = DupScore.fitCorpus(docs)
    val batch = DupScore.scoreWith(docs, sk)
      .as[(Long, Long, Long, Double)].collect().toSet
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    val (m1, m2) = rows.splitAt(rows.length / 2)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDupScore(
      mem.toDF().toDF("doc_id", "text"), sk)
      .writeStream.format("memory").queryName("dup_t")
      .outputMode("append").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dup_t")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("scale shape: scoring rides the scan — no exchange, no join") {
    val docs = Tables.documents(spark, sf)
    val sk = DupScore.fitCorpus(docs)
    val plan = DupScore.scoreWith(docs, sk)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"serve face must be a pure projection, got:\n$plan")
  }
}
