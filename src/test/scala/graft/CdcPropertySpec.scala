package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for content-defined chunking — the invariants hold
  * for ANY token stream, not just the corpus. (Raw scalacheck Gen with
  * fixed seeds, like [[ChunkPropertySpec]].)
  */
class CdcPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // small vocabulary on purpose: guarantees cut words recur, which is
  // what exercises boundary logic (a huge random vocab rarely cuts)
  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "rho")
  private val doc = Gen.chooseNum(1, 80).flatMap(n => Gen.listOfN(n, word))

  private def docsOf(seedBase: Int, n: Int): Seq[(Long, String)] =
    (1 to n).map { s =>
      val ws = doc.apply(Gen.Parameters.default, Seed(seedBase + s)).getOrElse(List("alpha"))
      (s.toLong, ws.mkString(" "))
    }

  test("lossless, non-empty, deterministic for arbitrary token streams") {
    val docs = docsOf(1000, 150)
    val out = Cdc.chunks(docs.toDF("doc_id", "text"))
      .select("doc_id", "chunk_index", "chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.sortBy(_._2).map(_._3).toList }
    val byId = docs.toMap
    out.foreach { case (id, chunks) =>
      assert(chunks.nonEmpty && chunks.forall(_.nonEmpty))
      assert(chunks.mkString(" ") == byId(id), s"lossy at doc $id")
    }
    assert(out.size == docs.size)
    // determinism: a second run mints identical chunk identities
    val again = Cdc.chunks(docs.toDF("doc_id", "text"))
      .select("doc_id", "chunk_index", "chunk_text")
      .as[(Long, Long, String)].collect().toSet
    assert(again == Cdc.chunks(docs.toDF("doc_id", "text"))
      .select("doc_id", "chunk_index", "chunk_text")
      .as[(Long, Long, String)].collect().toSet)
  }

  test("boundaries are content-defined: concatenating docs preserves interior chunks") {
    // chunks strictly between the first and last cut of a doc depend
    // only on that doc's words — gluing arbitrary prefix/suffix docs
    // around it must reproduce them all
    val docs = docsOf(5000, 60).toMap
    val glued = docs.toSeq.sortBy(_._1).sliding(2).collect {
      case Seq((idA, a), (_, b)) => (idA, a + " " + b)
    }.toSeq
    val single = Cdc.chunks(docs.toSeq.toDF("doc_id", "text"))
      .select("doc_id", "chunk_index", "chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.sortBy(_._2).map(_._3).toList }
    val combined = Cdc.chunks(glued.toDF("doc_id", "text"))
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    glued.foreach { case (idA, _) =>
      val bId = idA + 1
      // the FIRST doc keeps every chunk but its last (the seam merges
      // its tail into the next chunk); the SECOND keeps every chunk
      // but its first (absorbed up to its first cut)
      single(idA).dropRight(1).foreach { c =>
        assert(combined(idA).contains(c),
          s"leading chunk of doc $idA lost when glued before $bId")
      }
      single(bId).drop(1).foreach { c =>
        assert(combined(idA).contains(c),
          s"interior chunk of doc $bId lost when glued after $idA")
      }
    }
  }

  test("clamped chunks stay within [min, max] words and reassemble losslessly") {
    val (minW, maxW) = (4, 24)
    val docs = docsOf(7000, 150)
    val out = Cdc.boundedChunks(docs.toDF("doc_id", "text"), minW, maxW)
      .select("doc_id", "chunk_index", "n_words", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    val byId = docs.toMap
    out.foreach { case (id, chunks) =>
      // every chunk bounded above; every NON-terminal chunk bounded
      // below (the tail may run short — there is nothing to pad with)
      chunks.foreach { case (_, _, n, _) =>
        assert(n <= maxW, s"doc $id grew a $n-word chunk past max=$maxW")
      }
      chunks.dropRight(1).foreach { case (_, _, n, _) =>
        assert(n >= minW, s"doc $id cut a $n-word chunk under min=$minW")
      }
      assert(chunks.map(_._4).mkString(" ") == byId(id), s"lossy at doc $id")
    }
    assert(out.size == docs.size)
  }

  test("clamps bite where the unclamped chunker runs unbounded") {
    // a cut-word DROUGHT: one long doc of a single non-cutting word
    // (any word that never satisfies the mod-D test against itself)
    val nonCut = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
      .find { w =>
        val one = Seq((1L, (w + " ") * 3 + w)).toDF("doc_id", "text")
        Cdc.chunks(one).count() == 1
      }.get
    val drought = Seq((1L, Seq.fill(200)(nonCut).mkString(" ")))
      .toDF("doc_id", "text")
    assert(Cdc.chunks(drought).count() == 1,
      "unclamped CDC must yield one giant chunk under a cut drought")
    val clamped = Cdc.boundedChunks(drought, 4, 24)
      .select("n_words").as[Long].collect()
    assert(clamped.forall(_ <= 24) && clamped.length >= 200 / 24,
      s"max-clamp must force cuts through the drought: ${clamped.toSeq}")
    // a cut-word FLOOD: find a word that cuts on every occurrence
    val cutter = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "rho", "omega",
      "sigma", "tau", "phi", "chi", "psi")
      .find { w =>
        val one = Seq((1L, (w + " ") * 3 + w)).toDF("doc_id", "text")
        Cdc.chunks(one).count() == 4
      }.get
    val flood = Seq((1L, Seq.fill(60)(cutter).mkString(" ")))
      .toDF("doc_id", "text")
    assert(Cdc.chunks(flood).count() == 60,
      "unclamped CDC must shred a cut flood into confetti")
    val floodClamped = Cdc.boundedChunks(flood, 4, 24)
      .select("n_words").as[Long].collect()
    assert(floodClamped.dropRight(1).forall(_ >= 4),
      s"min-clamp must suppress sub-min cuts: ${floodClamped.toSeq}")
  }

  test("clamped boundaries still shift-resist: edits re-sync at an accepted cut") {
    val docs = docsOf(9000, 40)
    val edited = docs.map { case (id, text) =>
      (id, "prefixword " + text)
    }
    val a = Cdc.boundedChunks(docs.toDF("doc_id", "text"), 3, 30)
      .select("doc_id", "chunk_index", "chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(_._3) }
    val b = Cdc.boundedChunks(edited.toDF("doc_id", "text"), 3, 30)
      .select("doc_id", "chunk_index", "chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(_._3) }
    // across the corpus, MOST docs with >1 chunk must share their
    // terminal chunk(s) with the prepended version — clamped CDC
    // re-syncs at the first mutually-accepted cut. (Not every doc:
    // a doc whose only cut now falls inside the min-clamp window of
    // the shifted stream legitimately re-chunks — that is the
    // FastCDC trade. The unclamped theorem stays exact in
    // `boundaries are content-defined` above.)
    val multi = a.filter(_._2.length > 1).keys.toSeq
    val resynced = multi.count(id => b(id).last == a(id).last)
    assert(resynced * 10 >= multi.length * 7,
      s"only $resynced/${multi.length} docs re-synced after a prepend")
  }
}
