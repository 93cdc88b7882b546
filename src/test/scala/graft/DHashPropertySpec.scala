package graft

import graft.functions.DHash64
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the perceptual dHash — the invariants hold for
  * ANY payload, not just the fixture corpus. (Raw scalacheck Gen with
  * fixed seeds, the CdcPropertySpec convention.)
  */
class DHashPropertySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val payload = Gen.chooseNum(1, 900)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 255)))
    .map(_.map(_.toByte).toArray)

  private def payloadsOf(seedBase: Int, n: Int): Seq[(Long, Array[Byte])] =
    (1 to n).map { s =>
      (s.toLong, payload.apply(Gen.Parameters.default, Seed(seedBase + s))
        .getOrElse(Array[Byte](1)))
    }

  private def hashAll(rows: Seq[(Long, Array[Byte])]): Map[Long, Long] =
    rows.toDF("id", "p")
      .select(col("id"), DHash64.dhash64(col("p")).as("h"))
      .as[(Long, Long)].collect().toMap

  test("k-fold integer upsampling is hash-invariant for arbitrary payloads, k in 2..4") {
    val rows = payloadsOf(7000, 120)
    val base = hashAll(rows)
    for (k <- 2 to 4) {
      val up = rows.map { case (id, p) => (id, p.flatMap(b => Array.fill(k)(b))) }
      val h = hashAll(up)
      rows.foreach { case (id, _) =>
        assert(h(id) == base(id), s"payload $id broke ${k}x upsample invariance")
      }
    }
  }

  test("uniform brightness shift preserves every gradient sign") {
    val rows = payloadsOf(8000, 120)
      // keep headroom so +5 cannot wrap a 255 byte past the unsigned range
      .map { case (id, p) => (id, p.map(b => (b & 0x7f).toByte)) }
    val base = hashAll(rows)
    val bright = rows.map { case (id, p) => (id, p.map(b => (b + 5).toByte)) }
    val h = hashAll(bright)
    rows.foreach { case (id, _) =>
      assert(h(id) == base(id), s"payload $id broke brightness invariance")
    }
  }

  test("interpreted eval equals codegen for arbitrary payloads") {
    val rows = payloadsOf(9000, 60)
    val viaCodegen = hashAll(rows)
    rows.foreach { case (id, p) =>
      val interpreted = graft.functions.DHash64Expr(
        org.apache.spark.sql.catalyst.expressions.Literal(p)).eval(null)
        .asInstanceOf[Long]
      assert(interpreted == viaCodegen(id),
        s"payload $id: interpreted/codegen divergence")
    }
  }
}
