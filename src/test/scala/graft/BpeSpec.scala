package graft

import graft.operators.{Bpe, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // a corpus with real merge structure: "low/lower/lowest/newest/widest"
  // plus repetition so pair counts differ and ties are rare
  private val words = Seq(
    "low" -> 5L, "lower" -> 2L, "lowest" -> 6L,
    "newest" -> 6L, "widest" -> 3L, "new" -> 2L)
  private val docs = words
    .flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
    .grouped(4).zipWithIndex
    .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    .toSeq.toDF("doc_id", "text")

  /** Sequential BPE reference — the textbook learner: count adjacent
    * pairs over the (word, freq) vocab (overlaps count), take the max
    * (ties: lexicographic), merge greedily left-to-right, repeat.
    */
  private def seqBpe(ws: Seq[(String, Long)],
    rounds: Int): Seq[(String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      ws.filter(_._1.length >= 2)
        .map { case (w, f) => (w.map(_.toString).toVector, f) }
    var out = Vector.empty[(String, String, Long)]
    var r = 0
    var stop = false
    while (r < rounds && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out :+= ((a, b, n))
        vocab = vocab.map { case (syms, f) =>
          val merged = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc.init :+ (a + b)
            else acc :+ x
          }
          (merged, f)
        }
      }
      r += 1
    }
    out
  }

  test("train matches the sequential reference for the first 8 merges") {
    val want = seqBpe(words, 8)
    val got = Bpe.train(docs, 8)
      .orderBy(col("rank"))
      .select(col("left"), col("right"), col("n"))
      .as[(String, String, Long)].collect().toSeq
    assert(got == want,
      s"distributed merge sequence diverged:\n got $got\nwant $want")
  }

  test("round 1 is exactly q_bpe_merges' top pair") {
    docs.createOrReplaceTempView("bpe_docs")
    val first = Bpe.train(docs, 1)
      .select(col("merged"), col("n")).as[(String, Long)].collect()(0)
    // bpeMerges runs on the documents table; re-derive its top pair on
    // this corpus with the same vocab arithmetic
    val top = Bpe.pairCounts(Bpe.initVocab(docs))
      .select(concat(col("a"), col("b")).as("pair"), col("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(1).as[(String, Long)].collect()(0)
    assert(first == top)
  }

  test("earlier merges are a prefix of longer trainings") {
    val five = Bpe.train(docs, 5)
      .orderBy(col("rank"))
      .select(col("left"), col("right")).as[(String, String)].collect().toSeq
    val three = Bpe.train(docs, 3)
      .orderBy(col("rank"))
      .select(col("left"), col("right")).as[(String, String)].collect().toSeq
    assert(five.take(3) == three)
  }

  test("training stops when no pair remains") {
    val tiny = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(tiny, 10)
      .select(col("left"), col("right")).as[(String, String)].collect().toSeq
    // "ab" has one pair; after merging it the word is a single symbol
    assert(merges == Seq(("a", "b")))
  }

  test("segment applies a learned merge table to fresh text identically") {
    val merges = Bpe.train(docs, 6)
      .orderBy(col("rank"))
      .select(col("left"), col("right")).as[(String, String)].collect().toSeq
    val fresh = Seq((0L, "lowest newest slower")).toDF("doc_id", "text")
    val got = Bpe.segment(Bpe.initVocab(fresh), merges, block = 2)
      .select(col("syms")).as[Seq[String]].collect().toSeq
      .map(_.mkString("|")).sorted
    // sequential application of the same merges
    val want = Seq("lowest", "newest", "slower").map { w =>
      merges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }.mkString("|")
    }.sorted
    assert(got == want)
  }

  test("greedy fold == one boundary-anchored replace (the q_bpe_encode oracle rep)") {
    // the DuckDB mirror segments on '||'-bounded strings with ONE plain
    // replace(s, '|a||b|', '|ab|') pass; Java String.replace shares
    // DuckDB's semantics (left-to-right, non-overlapping, no rescan of
    // its own output), so the equivalence is testable here. The double
    // boundary is load-bearing: adjacent matches never share a
    // character (a single-pipe encoding pairs the wrong elements in
    // odd same-symbol runs — this test caught it)
    def foldMerge(syms: Vector[String], a: String, b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    def strMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
      val pat = "|" + a + "||" + b + "|"
      val rep = "|" + a + b + "|"
      ("||" + syms.mkString("||") + "||").replace(pat, rep)
        .split("\\|").filter(_.nonEmpty).toVector
    }
    // adversarial shapes: same-symbol runs (boundary sharing), long
    // alternations, merged-symbol prefix/suffix collisions
    val cases = Seq(
      (Vector("a", "a", "a", "a"), ("a", "a")),
      (Vector("a", "a", "a", "a", "a"), ("a", "a")),
      (Vector("a", "b", "a", "b", "a", "b", "a", "b"), ("a", "b")),
      (Vector("a", "a", "b"), ("a", "b")),
      (Vector("a", "b", "b"), ("a", "b")),
      (Vector("xa", "b"), ("a", "b")),       // suffix collision: no match
      (Vector("a", "bx"), ("a", "b")),       // prefix collision: no match
      (Vector("ab", "c"), ("b", "c")),       // symbol-internal: no match
      (Vector("a", "ab", "b"), ("a", "ab")),
      (Vector("ab", "b", "b"), ("ab", "b")))
    cases.foreach { case (syms, (a, b)) =>
      assert(foldMerge(syms, a, b) == strMerge(syms, a, b),
        s"diverged on $syms under ($a,$b)")
    }
    // randomized sweep over a 2-symbol alphabet, all 4 rules
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val syms = Vector.fill(2 + rnd.nextInt(9))(
        if (rnd.nextBoolean()) "a" else "b")
      for (a <- Seq("a", "b"); b <- Seq("a", "b"))
        assert(foldMerge(syms, a, b) == strMerge(syms, a, b),
          s"diverged on $syms under ($a,$b)")
    }
  }

  test("trainVocab over a full vocab (1-char words included) trains identically") {
    // q_bpe_encode trains on the UNFILTERED vocab — 1-char words carry
    // no pairs, so the merge sequence must match initVocab's filtered one
    val full = Seq(("a", 9L), ("ab", 4L), ("abc", 3L), ("b", 7L))
      .toDF("w", "tf")
      .select(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("syms"), col("tf"))
    val filtered = full.filter(size(col("syms")) >= 2)
    val a = Bpe.trainVocab(full, 4).orderBy(col("rank"))
      .select(col("left"), col("right")).as[(String, String)].collect().toSeq
    val b = Bpe.trainVocab(filtered, 4).orderBy(col("rank"))
      .select(col("left"), col("right")).as[(String, String)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("the corpus is folded once: training rounds run over the vocab only") {
    // the round's pair-count plan reads the materialized vocab, not
    // documents: no explode of text tokens may appear in it
    val vocab = Bpe.initVocab(docs).localCheckpoint()
    val plan = Bpe.pairCounts(vocab).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scan parquet"),
      s"per-round work must not rescan a corpus table:\n$plan")
  }
}
