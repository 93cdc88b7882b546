package graft

import graft.functions.{MediaDims, MediaDimsExpr}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the container-header parse: synthesized headers
  * round-trip for ARBITRARY dims and segment paddings, garbage never
  * throws, interpreted eval equals codegen. (Raw scalacheck Gen with
  * fixed seeds, the CdcPropertySpec convention.)
  */
class MediaDimsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16(v: Long): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def png(w: Long, h: Long, body: Array[Byte]): Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D).map(_.toByte) ++
      "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ body

  /** JPEG: SOI, `segs` filler segments (APPn/COM with given body
    * lengths), then SOF of the given marker.
    */
  private def jpeg(w: Long, h: Long, segs: Seq[(Int, Int)], sof: Int,
    body: Array[Byte]): Array[Byte] =
    Array(0xFF, 0xD8).map(_.toByte) ++
      segs.flatMap { case (marker, bodyLen) =>
        Array(0xFF.toByte, marker.toByte) ++ be16(bodyLen + 2) ++
          Array.fill(bodyLen)(0x41.toByte)
      } ++
      Array(0xFF.toByte, sof.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(h) ++ be16(w) ++ body

  private def dimsOf(rows: Seq[(Long, Array[Byte])]): Map[Long, Long] =
    rows.toDF("id", "p")
      .select(col("id"), MediaDims.dims(col("p")).as("v"))
      .as[(Long, Long)].collect().toMap

  private def packed(fmt: Long, w: Long, h: Long): Long =
    (fmt << 48) | (w << 24) | h

  test("synthesized PNG and JPEG headers round-trip for arbitrary dims/paddings") {
    val gen = for {
      w <- Gen.chooseNum(1L, 65535L)
      h <- Gen.chooseNum(1L, 65535L)
      isPng <- Gen.oneOf(true, false)
      nSegs <- Gen.chooseNum(0, 4)
      segLens <- Gen.listOfN(nSegs, Gen.chooseNum(0, 40))
      markers <- Gen.listOfN(nSegs, Gen.oneOf(0xE0, 0xE1, 0xFE, 0xDB))
      sof <- Gen.oneOf(0xC0, 0xC1, 0xC2)
      bodyN <- Gen.chooseNum(0, 50)
    } yield {
      // PNG dims are u32 in the container but the pack is 24-bit;
      // test the full u16 range either way
      val body = Array.fill(bodyN)(0x42.toByte)
      if (isPng) (png(w, h, body), packed(MediaDims.FmtPng, w, h))
      else (jpeg(w, h, markers.zip(segLens), sof, body),
        packed(MediaDims.FmtJpeg, w, h))
    }
    val cases = (1 to 200).map(s =>
      gen.apply(Gen.Parameters.default, Seed(4200 + s)).get)
    val rows = cases.zipWithIndex.map { case ((p, _), i) => (i.toLong, p) }
    val got = dimsOf(rows)
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i.toLong) == want,
        s"case $i: got ${got(i.toLong).toHexString}, want ${want.toHexString}")
    }
  }

  test("garbage, truncation, and missing SOF are total (0), never a throw") {
    val trunc = png(640, 480, Array.empty).take(20) // dies mid-IHDR
    val noSof = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x04, 0x41, 0x41)
      .map(_.toByte) // segment then EOF, SOF never found
    val badLen = Array(0xFF, 0xD8, 0xFF, 0xE0, 0xFF, 0xFF).map(_.toByte)
      // length field points far past the payload
    val rows = Seq(
      1L -> Array.empty[Byte],
      2L -> "just text".getBytes,
      3L -> trunc,
      4L -> noSof,
      5L -> badLen,
      6L -> Array.fill(100)(0xFF.toByte))
    val got = dimsOf(rows)
    rows.foreach { case (id, _) => assert(got(id) == 0L, s"payload $id") }
  }

  test("GIF logical-screen dims are LITTLE-endian u16 at fixed offsets") {
    def gif(ver: Char, w: Long, h: Long, body: Array[Byte]): Array[Byte] =
      s"GIF8${ver}a".getBytes ++
        Array((w & 0xFF).toByte, ((w >> 8) & 0xFF).toByte,
          (h & 0xFF).toByte, ((h >> 8) & 0xFF).toByte) ++ body
    val got = dimsOf(Seq(
      1L -> gif('9', 1024, 768, Array.fill(5)(3.toByte)),
      2L -> gif('7', 320, 200, Array.empty),
      3L -> gif('9', 80, 2, Array.empty), // asymmetric: catches a byte swap
      4L -> "GIF8".getBytes, // truncated signature
      5L -> gif('8', 10, 10, Array.empty))) // bad version byte
    assert(got(1L) == packed(MediaDims.FmtGif, 1024, 768))
    assert(got(2L) == packed(MediaDims.FmtGif, 320, 200))
    assert(got(3L) == packed(MediaDims.FmtGif, 80, 2))
    assert(got(4L) == 0L)
    assert(got(5L) == 0L)
    // interpreted == codegen
    assert(MediaDimsExpr(Literal(gif('9', 640, 480, Array.empty)))
      .eval(null) == packed(MediaDims.FmtGif, 640, 480))
  }

  test("0xFF fill bytes padding a marker are skipped (ITU T.81 B.1.1.2)") {
    // legal padding: any number of 0xFF bytes may precede a marker code;
    // a walk that reads a fill byte as the code misparses the length
    val base = jpeg(321, 123, Seq((0xE0, 5)), 0xC0, Array.fill(3)(9.toByte))
    def padBefore(sof: Byte, nFill: Int, p: Array[Byte]): Array[Byte] = {
      val i = p.indexOfSlice(Seq(0xFF.toByte, sof))
      p.take(i) ++ Array.fill(nFill)(0xFF.toByte) ++ p.drop(i)
    }
    val rows = Seq(
      1L -> padBefore(0xC0.toByte, 1, base),
      2L -> padBefore(0xC0.toByte, 7, base),
      3L -> jpeg(55, 44, Seq.empty, 0xC2, Array.empty) // control, no pad
    )
    val padded2 = padBefore(0xC2.toByte, 3, rows(2)._2)
    val got = dimsOf(rows :+ (4L -> padded2))
    assert(got(1L) == packed(MediaDims.FmtJpeg, 321, 123))
    assert(got(2L) == packed(MediaDims.FmtJpeg, 321, 123))
    assert(got(3L) == packed(MediaDims.FmtJpeg, 55, 44))
    assert(got(4L) == packed(MediaDims.FmtJpeg, 55, 44))
    // interpreted path agrees
    assert(MediaDimsExpr(Literal(padBefore(0xC0.toByte, 2, base)))
      .eval(null) == packed(MediaDims.FmtJpeg, 321, 123))
  }

  test("interpreted eval equals codegen on mixed payloads") {
    val payloads = Seq(
      png(1920, 1080, Array.fill(9)(7.toByte)),
      jpeg(800, 600, Seq((0xE0, 14), (0xFE, 3)), 0xC2, Array.fill(5)(1.toByte)),
      "plain".getBytes, Array.empty[Byte])
    val viaCodegen = dimsOf(payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) })
    payloads.zipWithIndex.foreach { case (p, i) =>
      val interpreted = MediaDimsExpr(Literal(p)).eval(null).asInstanceOf[Long]
      assert(interpreted == viaCodegen(i.toLong), s"payload $i diverged")
    }
  }

  private def le16(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def wav(rate: Long, ch: Long, bits: Long,
    junk: Seq[Int], body: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le32(1000) ++ "WAVE".getBytes ++
      junk.flatMap(j => "JUNK".getBytes ++ le32(j) ++
        Array.fill(j)(0x41.toByte) ++
        (if (j % 2 == 1) Array(0.toByte) else Array.empty[Byte])) ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
      le32(rate * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits) ++ body

  test("synthesized WAV headers round-trip: LE fields, junk chunks, odd-size padding") {
    val gen = for {
      rate <- Gen.chooseNum(8000L, 192000L)
      ch <- Gen.chooseNum(1L, 8L)
      bits <- Gen.oneOf(8L, 16L, 24L, 32L)
      nJunk <- Gen.chooseNum(0, 3)
      junkLens <- Gen.listOfN(nJunk, Gen.chooseNum(0, 33)) // odd sizes included
      bodyN <- Gen.chooseNum(0, 40)
    } yield (wav(rate, ch, bits, junkLens, Array.fill(bodyN)(7.toByte)),
      packed(MediaDims.FmtWav, rate, (ch << 8) | bits))
    val cases = (1 to 150).map(s =>
      gen.apply(Gen.Parameters.default, Seed(7700 + s)).get)
    val got = dimsOf(cases.zipWithIndex.map { case ((p, _), i) => (i.toLong, p) })
    cases.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i.toLong) == want,
        s"wav case $i: got ${got(i.toLong).toHexString}, want ${want.toHexString}")
    }
  }

  test("WAV totality: truncated fmt, corrupt chunk size, missing fmt are 0") {
    val good = wav(44100, 2, 16, Seq(5), Array.empty)
    val rows = Seq(
      1L -> good.take(20), // dies inside the first chunk header
      2L -> ("RIFF1234WAVE".getBytes ++ "JUNK".getBytes ++
        le32(Int.MaxValue.toLong) ++ Array.fill(4)(0.toByte)), // size off the end
      3L -> ("RIFF1234WAVE".getBytes ++ "data".getBytes ++ le32(4) ++
        Array.fill(4)(0.toByte))) // no fmt chunk at all
    val got = dimsOf(rows)
    rows.foreach { case (id, _) => assert(got(id) == 0L, s"payload $id") }
    // and the good one parses
    assert(dimsOf(Seq(9L -> good))(9L) ==
      packed(MediaDims.FmtWav, 44100, (2L << 8) | 16L))
  }

  test("media_dims is SQL-callable via GraftExtensions") {
    val v = spark.sql(
      "SELECT media_dims(unhex('89504E470D0A1A0A0000000D49484452" +
        "0000028000000168" + "0806000000')) AS v")
      .collect().head.getLong(0)
    assert(v == packed(MediaDims.FmtPng, 640, 360))
  }
}
