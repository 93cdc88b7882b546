package graft

import graft.operators.Corpus
import graft.operators.Corpus.{DocTok, PackedDoc}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("weighted sample: inclusion law matches a driver-side fold over every doc") {
    import graft.operators.TextAnalysis
    val kept = Corpus.sampleWeighted(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val q = TextAnalysis.quality(spark, sf)
      .select(col("doc_id"), col("quality")).as[(Long, Double)].collect()
    // dsum mirrors: fix each r6 weight to decimal(·,6) then sum exactly
    val sw = q.map(v => BigDecimal(v._2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = q.filter { case (id, w) =>
      val hex = md.digest(s"samp:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7)
      val bucket = java.lang.Long.parseLong(hex, 16)
      bucket < math.floor(Corpus.SampleTarget * w * 268435456.0 / sw + 0.5).toLong
    }.map(_._1).toSet
    assert(kept == expect, "kept set must equal the per-row threshold law")
    assert(kept.nonEmpty && kept.size < q.length)
  }

  test("greedy packing: budget never exceeded, matches the sequential reference") {
    val budget = 500L
    val docsTok = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(graft.functions.TextSim.tokens(col("text"))).cast("long").as("n_tokens"))
      .as[DocTok]
    val got = Corpus.packGreedy(docsTok, budget).collect()
      .sortBy(d => (d.source, d.doc_id))

    // sequential reference: per source in doc_id order
    val ref = docsTok.collect().groupBy(_.source).toSeq.flatMap { case (src, ds) =>
      var seq = 0L; var fill = 0L
      ds.sortBy(_.doc_id).map { d =>
        if (fill + d.n_tokens > budget && fill > 0) { seq += 1; fill = 0L }
        fill += d.n_tokens
        PackedDoc(src, d.doc_id, d.n_tokens, seq)
      }
    }.sortBy(d => (d.source, d.doc_id))
    assert(got.toSeq == ref)

    // invariant: a sequence's total fits the budget unless it is a
    // single over-budget doc
    got.groupBy(d => (d.source, d.seq_id)).foreach { case (k, ds) =>
      val total = ds.map(_.n_tokens).sum
      assert(total <= budget || ds.length == 1,
        s"sequence $k holds $total tokens across ${ds.length} docs")
    }
    // sequences are contiguous per source starting at 0
    got.groupBy(_.source).foreach { case (_, ds) =>
      val seqs = ds.sortBy(_.doc_id).map(_.seq_id)
      assert(seqs.head == 0L)
      seqs.sliding(2).foreach {
        case Array(a, b) => assert(b == a || b == a + 1)
        case _ =>
      }
    }
  }

  test("vocab counts of disjoint batches merge to the whole-corpus table, any order") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val parts = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    def m(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      df.select(col("term"), col("tf"), col("df"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val whole = m(Corpus.vocabCounts(docs))
    val merged = m(parts.map(Corpus.vocabCounts).reduce(Corpus.mergeVocab))
    val mergedRev = m(parts.reverse.map(Corpus.vocabCounts).reduce(Corpus.mergeVocab))
    assert(whole.nonEmpty && merged == whole && mergedRev == whole)
    // the q_vocab head read from the merged table matches the one-shot query
    val headMerged = Corpus.vocabHead(
      parts.map(Corpus.vocabCounts).reduce(Corpus.mergeVocab))
      .as[(String, Long, Long)].collect().toSeq
    val headWhole = Corpus.vocab(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(headMerged == headWhole)
  }

  test("audit sample: exactly N, TakeOrdered plan, bottom-k stability") {
    val out = Corpus.auditSample(spark, sf)
    assert(out.count() == Corpus.AuditN)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"expected partial top-N, got:\n$plan")
    // growth stability: inserting m docs displaces at most m samples
    val orig = out.select(col("doc_id")).as[Long].collect().toSet
    val extra = (9000001L to 9000010L).map(i => (i, "srcX", "x", 1L, "en"))
      .toDF("doc_id", "source", "text", "n_chars", "lang")
    val grown = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"), col("lang"))
      .unionByName(extra.select(col("doc_id"), col("source"), col("text"),
        col("n_chars"), col("lang")))
      .select(col("doc_id"), col("source"),
        md5(concat(lit("audit:"), col("doc_id"))).as("rk"))
      .orderBy(col("rk")).limit(Corpus.AuditN)
      .select(col("doc_id")).as[Long].collect().toSet
    assert((orig -- grown).size <= 10, "an insert displaces at most one sample each")
  }

  test("per-group sample plans as a bounded partial aggregate, never a window") {
    val out = Corpus.sampleGroup(spark, sf)
    assert(out.count() > 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the BottomKByHash partial aggregate:\n$plan")
    assert(!plan.contains("Window"),
      s"per-group bottom-k must not sort whole strata:\n$plan")
    // consistency with the global audit sample: a doc sampled globally
    // that survives into its source's top-k carries the same rank hash
    val perSrc = out.select(col("doc_id"), col("rk"))
      .as[(Long, String)].collect().toMap
    val global = Corpus.auditSample(spark, sf)
      .select(col("doc_id"), col("rk")).as[(Long, String)].collect()
    global.filter(g => perSrc.contains(g._1)).foreach { case (id, rk) =>
      assert(perSrc(id) == rk, s"rank-hash domains diverged for doc $id")
    }
  }

  test("keepBest argmax is a partial aggregate and keeps ties on the original") {
    import graft.operators.Dedup
    val nodes = Seq(1L, 2L, 3L, 4L, 7L, 9L).toDF("doc_id")
    // doc 7 is unscored (e.g. empty text under the quality tokenizer)
    val scored = Seq((1L, 0.5), (2L, 0.5), (3L, 0.9), (4L, 0.2), (9L, 0.7))
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (3L, 4L), (4L, 7L)).toDF("a_id", "b_id")
    val out = Dedup.keepBestFrom(nodes, scored, pairs)
      .as[(Long, Double, Long, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(out.size == 6, "every node must appear, scored or not")
    // cluster {1,2}: equal quality -> smallest id wins
    assert(out(1L) == (1L, true) && out(2L) == (1L, false))
    // cluster {3,4,7}: 3 has highest quality; unscored 7 loses with
    // sentinel quality but is still LABELED, not dropped
    assert(out(3L) == (3L, true) && out(4L) == (3L, false))
    assert(out(7L) == (3L, false))
    // isolated doc keeps itself
    assert(out(9L) == (9L, true))
    val plan = Dedup.keepBestFrom(nodes, scored, pairs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"cluster argmax must be max(struct), not a window:\n$plan")
  }

  test("stratified split realizes 80/10/10 exactly (±1) within every source") {
    val out = Corpus.splitStratified(spark, sf)
      .groupBy(col("source"), col("split")).agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (src, rows) =>
        src -> rows.map(r => r._2 -> r._3).toMap }
    assert(out.nonEmpty)
    out.foreach { case (src, m) =>
      val n = m.values.sum
      assert(m.getOrElse("train", 0L) == n * 80 / 100, s"$src train")
      assert(m.getOrElse("val", 0L) == n * 90 / 100 - n * 80 / 100, s"$src val")
    }
  }

  test("negative sampler never serves a known positive when pairs are supplied") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    // fabricate a pair table naming some (anchor, negative) collisions
    // the plain sampler is known to emit
    val plain = Corpus.negSample(spark, sf)
      .select(col("doc_id").as("a_id"), col("neg_id").as("b_id"))
      .limit(20)
    val out = Corpus.negativesFor(docs, plain)
      .select(col("doc_id"), col("neg_id"))
      .join(plain, col("doc_id") === col("a_id") && col("neg_id") === col("b_id"))
    assert(out.count() == 0, "excluded pairs must not appear")
    // reverse orientation is excluded too
    val rev = plain.select(col("b_id").as("a_id"), col("a_id").as("b_id"))
    val out2 = Corpus.negativesFor(docs, rev)
      .select(col("doc_id"), col("neg_id"))
      .join(plain, col("doc_id") === col("a_id") && col("neg_id") === col("b_id"))
    assert(out2.count() == 0, "pair exclusion must be orientation-free")
  }
}
