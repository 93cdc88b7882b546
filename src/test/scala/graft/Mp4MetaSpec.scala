package graft

import graft.functions.{Mp4Meta, Mp4MvhdExpr}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the MP4/ISO-BMFF movie-header parse: synthesized
  * box chains round-trip for arbitrary timescale/duration/paddings and
  * both mvhd versions, garbage and truncation never throw, interpreted
  * eval equals codegen. (The MediaDimsSpec conventions.)
  */
class Mp4MetaSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(tpe: String, body: Array[Byte]): Array[Byte] =
    be32(8L + body.length) ++ tpe.getBytes ++ body

  private def mvhd0(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", Array.fill(12)(0.toByte) ++ be32(ts) ++ be32(dur) ++
      Array.fill(80)(0.toByte))

  private def mvhd1(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ Array.fill(16)(0.toByte) ++
      be32(ts) ++ be32(0L) ++ be32(dur) ++ Array.fill(80)(0.toByte))

  private def mp4(ts: Long, dur: Long, v1: Boolean,
    freeN: Int, udtaN: Int, body: Array[Byte]): Array[Byte] =
    box("ftyp", "isom".getBytes ++ be32(0x200L)) ++
      box("free", Array.fill(freeN)(0x41.toByte)) ++
      box("moov", box("udta", Array.fill(udtaN)(0x42.toByte)) ++
        (if (v1) mvhd1(ts, dur) else mvhd0(ts, dur))) ++ body

  private def mvhdOf(rows: Seq[(Long, Array[Byte])]): Map[Long, Long] =
    rows.toDF("id", "p")
      .select(col("id"), Mp4Meta.mvhd(col("p")).as("v"))
      .as[(Long, Long)].collect().toMap

  test("synthesized box chains round-trip for arbitrary ts/dur/paddings/version") {
    val gen = for {
      ts <- Gen.chooseNum(1L, 0x7FFFFFFFL)
      dur <- Gen.chooseNum(0L, 0xFFFFFFFFL)
      v1 <- Gen.oneOf(true, false)
      freeN <- Gen.chooseNum(0, 40)
      udtaN <- Gen.chooseNum(0, 40)
      bodyN <- Gen.chooseNum(0, 50)
    } yield (mp4(ts, dur, v1, freeN, udtaN, Array.fill(bodyN)(0x43.toByte)),
      (ts << 32) | dur)
    val cases = (1 to 200).map(s =>
      gen.apply(Gen.Parameters.default, Seed(8400 + s)).get)
    val got = mvhdOf(cases.zipWithIndex.map { case ((p, _), i) => (i.toLong, p) })
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i.toLong) == want,
        s"case $i: got ${got(i.toLong).toHexString}, want ${want.toHexString}")
    }
  }

  test("garbage, truncation, and corrupt sizes are total (0), never a throw") {
    val whole = mp4(600, 9000, v1 = false, 3, 2, Array.empty)
    val rows = Seq(
      1L -> Array.empty[Byte],
      2L -> "just text".getBytes,
      3L -> whole.take(30), // dies inside free, before moov
      4L -> whole.take(whole.indexOfSlice("mvhd".getBytes) + 8), // mvhd header only: version byte out of bounds
      5L -> (be32(0L) ++ "free".getBytes ++ whole), // size-0 box stops the walk
      6L -> (be32(1L) ++ "moov".getBytes ++ whole), // largesize stops the walk
      7L -> box("moov", box("mvhd", Array[Byte](9, 0, 0, 0))), // unknown version
      8L -> box("moov", mvhd0(0L, 0L)), // ts=dur=0 packs to 0: unrecognized
      9L -> box("moov", be32(8L) ++ "mvhd".getBytes)) // mvhd header IS the last 8 bytes of moov: version byte out of bounds
    val got = mvhdOf(rows)
    rows.foreach { case (id, _) => assert(got(id) == 0L, s"payload $id") }
  }

  test("mvhd outside moov is never read; first mvhd inside moov wins") {
    // a top-level mvhd (malformed file) must be skipped as an opaque box
    val strayFirst = mvhd0(111L, 222L) ++
      box("moov", mvhd0(600L, 1200L))
    // two mvhds inside moov: the walk stops at the first
    val twoInside = box("moov", mvhd0(600L, 1200L) ++ mvhd1(999L, 888L))
    val got = mvhdOf(Seq(1L -> strayFirst, 2L -> twoInside))
    assert(got(1L) == ((600L << 32) | 1200L))
    assert(got(2L) == ((600L << 32) | 1200L))
  }

  test("interpreted eval equals codegen on mixed payloads") {
    val payloads = Seq(
      mp4(90000, 5400000, v1 = false, 5, 0, Array.fill(7)(9.toByte)),
      mp4(1000, 0xFFFFFFFFL, v1 = true, 0, 13, Array.empty),
      "plain".getBytes, Array.empty[Byte],
      mp4(600, 9000, v1 = false, 3, 2, Array.empty).take(40))
    val viaCodegen = mvhdOf(payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) })
    payloads.zipWithIndex.foreach { case (p, i) =>
      val interpreted = Mp4MvhdExpr(Literal(p)).eval(null).asInstanceOf[Long]
      assert(interpreted == viaCodegen(i.toLong), s"payload $i diverged")
    }
  }
}
