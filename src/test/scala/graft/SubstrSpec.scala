package graft

import graft.operators.Substr
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

class SubstrSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Brute-force reference: flag every position whose k-substring
    * occurs >= 2 times corpus-wide, merge overlapping/adjacent flags
    * into maximal spans, report per doc.
    */
  private def ref(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Double)] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, t) <- docs if t.length >= k; i <- 0 to t.length - k) {
      val g = t.substring(i, i + k)
      counts(g) = counts.getOrElse(g, 0) + 1
    }
    docs.flatMap { case (id, t) =>
      if (t.length < k) None
      else {
        val flagged = (0 to t.length - k).filter(i => counts(t.substring(i, i + k)) >= 2)
        if (flagged.isEmpty) None
        else {
          var spans = List.empty[(Int, Int)] // (start, end) newest first
          for (p <- flagged) spans = spans match {
            case (s, e) :: rest if p <= e => (s, math.max(e, p + k)) :: rest
            case _ => (p, p + k) :: spans
          }
          val dupChars = spans.map { case (s, e) => e - s }.sum
          Some(id -> (spans.size.toLong, dupChars.toLong, r6(dupChars.toDouble / t.length)))
        }
      }
    }.toMap
  }

  private def collectStats(out: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Double)] =
    out.select("doc_id", "n_spans", "dup_chars", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, n, c, f) => id -> (n, c, f) }.toMap

  test("substrStats matches the brute-force reference on a hand corpus (k=4)") {
    // doc 1 and 2 share "SHARED-RUN"; doc 3 is unique text; doc 4 has a
    // WITHIN-doc repeat ("abcdabcd" -> gram "abcd" twice)
    val docs = Seq(
      (1L, "xq1 SHARED-RUN zq2w"),
      (2L, "pe9 SHARED-RUN kr7m"),
      (3L, "totally unique prose"),
      (4L, "abcdabcd 0text0"))
    val got = collectStats(Substr.substrStats(docs.toDF("doc_id", "text"), k = 4))
    assert(got == ref(docs, 4))
    assert(got.contains(1L) && got.contains(2L) && got.contains(4L) && !got.contains(3L))
    // the shared run " SHARED-RUN " (12 chars incl. both spaces) is one span
    assert(got(1L)._1 == 1L && got(1L)._2 == 12L)
  }

  test("substrStats matches the brute-force reference on real docs_aug (k=40)") {
    val aug = graft.Tables.docsAug(spark, sf)
    val local = aug.as[(Long, String)].collect().toSeq
    val got = collectStats(Substr.substrStats(aug))
    assert(got == ref(local, Substr.GramLen))
    // injected full clones (base text unchanged) are 100% duplicated
    val cloneBases = local.collect {
      case (id, t) if id < 1000000L && id % 10 == 0 && t.length >= Substr.GramLen => id
    }
    assert(cloneBases.nonEmpty)
    cloneBases.foreach { id =>
      assert(got(id) == ((1L, local.find(_._1 == id).get._2.length.toLong, 1.0)),
        s"clone base $id should be one full-length span")
    }
  }

  test("mod-p content sampling: clone-consistent, and a lower bound on exact") {
    val aug = graft.Tables.docsAug(spark, sf)
    val exact = collectStats(Substr.substrStats(aug))
    val sampled = collectStats(Substr.substrStats(aug, modP = 4))
    // sampling only removes grams: flagged docs shrink, dup_chars never grows
    assert(sampled.keySet.subsetOf(exact.keySet))
    sampled.foreach { case (id, (_, c, _)) => assert(c <= exact(id)._2) }
    // selection depends on gram CONTENT only -> identical texts get
    // identical span stats (the invariant stride sampling lacks)
    val ids = sampled.keySet
    ids.filter(id => id >= 1000000L && id < 2000000L).foreach { clone =>
      val base = clone - 1000000L
      assert(sampled.get(base) == sampled.get(clone),
        s"clone pair $base/$clone diverged under sampling")
    }
  }

  test("dropDupSpans deletes later copies, keeps first occurrences (k=4)") {
    val docs = Seq(
      (1L, "xq1 SHARED-RUN zq2w"),
      (2L, "pe9 SHARED-RUN kr7m"),
      (3L, "totally unique prose"),
      (4L, "abcdabcd 0text0")).toDF("doc_id", "text")
    val out = Substr.dropDupSpans(docs, k = 4)
      .select("doc_id", "text", "removed_chars")
      .as[(Long, String, Long)].collect()
      .map { case (id, t, r) => id -> ((t, r)) }.toMap
    // doc 1 holds every keeper of the shared run -> intact; doc 2
    // loses the 12-char run; doc 4 keeps the first "abcd" only
    assert(out(1L) == (("xq1 SHARED-RUN zq2w", 0L)))
    assert(out(2L) == (("pe9kr7m", 12L)))
    assert(out(3L) == (("totally unique prose", 0L)))
    assert(out(4L) == (("abcd 0text0", 4L)))
  }

  test("dropDupSpans on real docs_aug: clones vanish, chars conserve, dup mass shrinks") {
    val aug = graft.Tables.docsAug(spark, sf)
    val orig = aug.as[(Long, String)].collect().toMap
    val cleaned = Substr.dropDupSpans(aug)
    val got = cleaned.select("doc_id", "text", "removed_chars")
      .as[(Long, String, Long)].collect()
    assert(got.length == orig.size) // every doc comes back
    // conservation: cleaned length + removed == original length
    got.foreach { case (id, t, r) =>
      assert(t.length + r == orig(id).length, s"doc $id leaks chars")
    }
    // an injected full clone's keeper copy is the base doc -> the
    // clone deletes to empty
    val clones = got.filter { case (id, _, _) =>
      id >= 1000000L && id < 2000000L && orig(id).length >= Substr.GramLen
    }
    assert(clones.nonEmpty)
    clones.foreach { case (id, t, r) =>
      assert(t.isEmpty && r == orig(id).length, s"clone $id not removed: '$t'")
    }
    // one pass strictly shrinks corpus-wide duplication (not to zero:
    // splicing can mint new seam grams)
    val before = Substr.substrStats(aug)
      .agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum("dup_chars"),
        org.apache.spark.sql.functions.lit(0L))).as[Long].head()
    val after = Substr.substrStats(cleaned.select("doc_id", "text"))
      .agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum("dup_chars"),
        org.apache.spark.sql.functions.lit(0L))).as[Long].head()
    assert(after < before, s"dup mass $before -> $after")
  }

  // AQE wraps the plan: descend through AdaptiveSparkPlanExec /
  // materialized query stages to reach the actual exchanges
  private def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
    p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case s: ShuffleExchangeExec => s +: s.children.flatMap(shuffles)
      case other => other.children.flatMap(shuffles)
    }

  test("gram shuffle carries hashes and ids, never text") {
    val out = Substr.substrStats(graft.Tables.docsAug(spark, sf))
    out.count()
    val exchanges = shuffles(out.queryExecution.executedPlan)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      assert(!e.output.exists(_.name == "text"),
        s"exchange must not ship document text: ${e.output.map(_.name)}")
    }
  }
}
