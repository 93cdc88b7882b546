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
}
