package graft

import graft.operators.Etl
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the greedy chunker — the packing invariants hold
  * for ANY input, not just the corpus. (Raw scalacheck Gen with fixed
  * seeds; the scalatest bridge artifact isn't in the offline cache.)
  */
class ChunkPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val word = Gen.chooseNum(1, 15).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val doc = Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, word))
  private val maxLenGen = Gen.chooseNum(3, 40)

  private def cases: Seq[(List[String], Int)] = (1 to 120).map { s =>
    val p = Gen.Parameters.default
    (doc.apply(p, Seed(s)).getOrElse(Nil),
      maxLenGen.apply(p, Seed(s * 7919L)).getOrElse(10))
  }

  test("chunks reassemble to the token stream and respect the length cap") {
    // one distributed pass over all generated docs
    val inputs = cases.zipWithIndex.map { case ((ws, ml), i) => (i.toLong, ws, ml) }
    val byCase = inputs.map { case (id, ws, ml) =>
      val chunks = Etl.chunkLinear(
        Seq(Etl.DocText(id, ws.mkString(" "))).toDS(), ml)
        .collect().sortBy(_.chunk_index).map(_.chunk_text).toList
      (ws, ml, chunks)
    }
    byCase.foreach { case (words, maxLen, chunks) =>
      // 1. lossless: chunk tokens concatenate back to the input tokens
      assert(chunks.flatMap(_.split(" ")).filter(_.nonEmpty) ==
        words.filter(_.nonEmpty), s"lossy at maxLen=$maxLen words=$words")
      // 2. no empty chunks
      assert(chunks.forall(_.nonEmpty))
      // 3. cap: separator-free length fits unless a single oversized word
      chunks.foreach { c =>
        val toks = c.split(" ").filter(_.nonEmpty)
        assert(toks.map(_.length).sum <= maxLen || toks.length == 1,
          s"overfull chunk '$c' at maxLen=$maxLen")
      }
      // 4. greedy: a chunk's first token never fits in the previous chunk
      chunks.sliding(2).foreach {
        case List(prev, next) =>
          val prevLen = prev.split(" ").filter(_.nonEmpty).map(_.length).sum
          val nextFirst = next.split(" ").filter(_.nonEmpty).head
          assert(prevLen + nextFirst.length > maxLen,
            s"non-greedy split '$prev' | '$next' at maxLen=$maxLen")
        case _ => ()
      }
    }
  }

  test("expression chunker agrees with the linear chunker on random input") {
    cases.take(40).foreach { case (words, maxLen) =>
      val text = words.mkString(" ")
      val viaLinear = Etl.chunkLinear(Seq(Etl.DocText(1L, text)).toDS(), maxLen)
        .collect().sortBy(_.chunk_index).map(_.chunk_text).toSeq
      val viaExpr = Seq(text).toDF("text")
        .select(Etl.chunkTokens(org.apache.spark.sql.functions.col("text"), maxLen))
        .as[Seq[String]].head()
      assert(viaLinear == viaExpr, s"divergence at maxLen=$maxLen text='$text'")
    }
  }
}
