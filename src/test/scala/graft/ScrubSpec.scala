package graft

import graft.operators.{Quantize, Scrub}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScrubSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("boilerplateUnits finds exactly the cross-doc repeated units") {
    // docs 1 and 2 share one 8-word unit; doc 3 is disjoint; doc 4
    // repeats the shared unit twice WITHIN one doc (counts once)
    val shared = "a b c d e f g h"
    val docs = Seq(
      (1L, shared + " tail1 x y z q w e r"),
      (2L, shared + " tail2 j k l m n o p"),
      (3L, "entirely different words one two three four five"),
      (4L, shared + " " + shared)
    ).toDF("doc_id", "text")
    val out = Scrub.boilerplateUnits(docs, w = 8, minDocs = 2)
      .as[(String, Long)].collect().toMap
    assert(out == Map(shared -> 3L))
  }

  test("paraFuzzyPairs catches a one-word-edited boilerplate paragraph the exact hash misses") {
    // docs 1-3 carry the same 8-word boilerplate paragraph; doc 4
    // carries a ONE-WORD-edited variant (position 4: 'd' -> 'X').
    // Exact unit hashing collapses 1-3 and leaves 4 disconnected;
    // the fuzzy pass must link the variant to the original with
    // Jaccard >= 0.3 (a 1-of-8 edit keeps 3 of the 6 word-3-grams),
    // and report the original's doc frequency 3.
    val boiler = "aa bb cc dd ee ff gg hh"
    val edited = "aa bb cc XX ee ff gg hh"
    val docs = Seq(
      (1L, boiler + " one two three four five six seven eight"),
      (2L, boiler + " red green blue cyan teal plum gold jade"),
      (3L, boiler + " nine ten eleven twelve thirteen fox owl elk"),
      (4L, edited + " north south east west up down left right")
    ).toDF("doc_id", "text")
    val pairs = Scrub.paraFuzzyPairs(docs)
      .as[(String, String, Double, Long, Long)].collect()
    val hit = pairs.filter(p => Set(p._1, p._2) == Set(boiler, edited))
    assert(hit.length == 1, s"variant pair not caught: ${pairs.toSeq}")
    assert(hit.head._3 >= 0.3)
    // doc frequencies ride the pair: the original is corpus boilerplate
    val (aDocs, bDocs) =
      if (hit.head._1 == boiler) (hit.head._4, hit.head._5)
      else (hit.head._5, hit.head._4)
    assert(aDocs == 3L && bDocs == 1L)
    // and the exact hasher indeed misses it: the variant unit never
    // reaches the boilerplate table (exact unit equality only)
    val exact = Scrub.boilerplateUnits(docs, w = 8, minDocs = 2)
      .as[(String, Long)].collect().toMap
    assert(exact.contains(boiler) && !exact.contains(edited))
  }

  test("paraDedupStats counts intra-doc repeats and builds an order-free identity") {
    val docs = Seq(
      (1L, "x y x y a b"),   // units: [x y, x y, a b] -> 3 total, 2 unique
      (2L, "a b x y x y"),   // same unit SET, different order/position
      (3L, "only one unitx") // 2 tokens -> 1 unit, no repeats
    ).toDF("doc_id", "text")
    val out = Scrub.paraDedupStats(docs, w = 2)
      .select("doc_id", "n_units", "n_unique", "rep_ratio", "clean_hash")
      .as[(Long, Long, Long, Double, String)].collect().sortBy(_._1)
    assert(out(0)._2 == 3 && out(0)._3 == 2 && out(0)._4 > 0.33 && out(0)._4 < 0.34)
    // docs 1 and 2 collide on the repetition-free identity
    assert(out(0)._5 == out(1)._5)
    assert(out(2)._2 == 1 && out(2)._4 == 0.0)
  }

  test("scrubPii counts and redacts emails, phones, IPv4") {
    val docs = Seq(
      (1L, "mail a.user+tag@sub.example.org and b@x.io call +44-207-1234 from 192.168.0.1 ok"),
      (2L, "no pii here at all")
    ).toDF("doc_id", "text")
    val out = Scrub.scrubPii(docs)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0)._2 == 2 && out(0)._3 == 1 && out(0)._4 == 1)
    assert(out(1)._2 == 0 && out(1)._3 == 0 && out(1)._4 == 0)
    // redaction really rewrites: scrubbed hash == hash of the expected text
    val expected = spark.sql(
      "SELECT md5('mail <EMAIL> and <EMAIL> call <PHONE> from <IP> ok')")
      .as[String].head()
    assert(out(0)._5 == expected)
  }

  test("quantize maps min to -127, max to 127, constant dims to 0") {
    val vecs = Seq(
      (1L, Array(0.0f, 5.0f, 1.0f)),
      (2L, Array(1.0f, 5.0f, 3.0f)),
      (3L, Array(2.0f, 5.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val out = Quantize.quantize(vecs).as[(Long, String)].collect().toMap
    // dim1: [0,2] -> 0->-127, 1->0, 2->127; dim2 constant -> 0
    // dim3: [1,3] -> 1->-127, 3->127, 2->0
    assert(out(1L) == "-127,0,-127")
    assert(out(2L) == "0,0,127")
    assert(out(3L) == "127,0,0")
  }

  test("scrub before dedup: redaction restores identity per-doc PII destroyed") {
    // same document, but each copy carries ITS OWN contact line (the
    // real-world shape: mirrored pages with per-user footers)
    val body = "shared body words that are identical across the mirrors"
    val docs = Seq(
      (1L, body + " contact alice@example.com from 10.0.0.1"),
      (2L, body + " contact bob@example.org from 10.0.0.2")
    ).toDF("doc_id", "text")
    // unscrubbed: the PII makes the copies distinct -> exact dedup misses
    assert(operators.Dedup.exactGroups(docs).count() == 0)
    // scrubbed: identical again -> one group, keeper is the min id
    val groups = operators.Dedup.exactGroups(operators.Scrub.scrubbedDocs(docs))
      .select("keep_id", "n_copies").as[(Long, Long)].collect()
    assert(groups.toSeq == Seq((1L, 2L)))
  }

  test("quantize stats pass is shuffle-bounded and the map pass broadcast") {
    val vecs = Seq((1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val plan = Quantize.quantize(vecs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      s"stats should broadcast, got:\n$plan")
  }
}
