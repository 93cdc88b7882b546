package graft

import graft.sources.MediaExtract
import org.scalatest.funsuite.AnyFunSuite

/** [[MediaExtract.exifAscii]] + the merged JPEG walk — the r11 third
  * extraction rung. Fixtures are hand-assembled TIFF bodies (both
  * byte orders, inline and offset ASCII values) and deliberately
  * corrupt variants: every bound the walk checks is crossed once.
  */
class ExifSpec extends AnyFunSuite {

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(s => Integer.parseInt(s, 16).toByte).toArray

  // II TIFF: IFD0 @8, 2 entries — Make (0x010F, "d7\0" inline) and
  // ImageDescription (0x010E, "hello world\0" at offset 38)
  private val tiffLe = hexBytes(
    "49492A00 08000000 0200" +
      "0F010200 03000000 64370000" +
      "0E010200 0C000000 26000000" +
      "00000000" +
      "68656C6C6F20776F726C6400")

  // MM twin of the same logical content
  private val tiffBe = hexBytes(
    "4D4D002A 00000008 0002" +
      "010F0002 00000003 64370000" +
      "010E0002 0000000C 00000026" +
      "00000000" +
      "68656C6C6F20776F726C6400")

  private def app1(tiff: Array[Byte]): Array[Byte] = {
    val exif = hexBytes("457869660000") ++ tiff
    val ln = exif.length + 2
    hexBytes("FFE1") ++ Array(((ln >> 8) & 0xFF).toByte, (ln & 0xFF).toByte) ++ exif
  }

  private def jpeg(segs: Array[Byte]*): Array[Byte] =
    hexBytes("FFD8") ++ segs.flatten ++ hexBytes("FFD9")

  private def com(s: String): Array[Byte] = {
    val b = s.getBytes("ISO-8859-1")
    hexBytes("FFFE") ++ Array((((b.length + 2) >> 8) & 0xFF).toByte,
      ((b.length + 2) & 0xFF).toByte) ++ b
  }

  test("both byte orders parse to identical tag renderings") {
    val want = Some("Exif.010F=d7; Exif.010E=hello world")
    assert(MediaExtract.exifAscii(app1(tiffLe), 10, app1(tiffLe).length) == want)
    assert(MediaExtract.exifAscii(app1(tiffBe), 10, app1(tiffBe).length) == want)
  }

  test("walk merges COM and EXIF in stream order") {
    val p1 = jpeg(app1(tiffLe), com("after"))
    assert(MediaExtract.decodeJpegText(p1)
      == Some("Exif.010F=d7; Exif.010E=hello world; after"))
    val p2 = jpeg(com("before"), app1(tiffBe))
    assert(MediaExtract.decodeJpegText(p2)
      == Some("before; Exif.010F=d7; Exif.010E=hello world"))
    assert(MediaExtract.decodeJpegCom(p1) == Some("after"))
    assert(MediaExtract.decodeJpegExif(p1)
      == Some("Exif.010F=d7; Exif.010E=hello world"))
    assert(MediaExtract.decodeJpegExif(jpeg(com("only"))) == None)
  }

  test("garbage tolerance: every validated bound, crossed once") {
    val good = app1(tiffLe)
    // bad byte-order mark
    val bom = good.clone(); bom(10) = 'Q'.toByte
    assert(MediaExtract.exifAscii(bom, 10, bom.length) == None)
    // bad TIFF magic
    val magic = good.clone(); magic(12) = 99.toByte
    assert(MediaExtract.exifAscii(magic, 10, magic.length) == None)
    // IFD offset past the segment: ifd + 2 > end
    val farIfd = good.clone(); farIfd(17) = 0x7F.toByte
    assert(MediaExtract.exifAscii(farIfd, 10, farIfd.length) == None)
    // value offset past the segment: entry skipped, inline one survives
    val farVal = good.clone(); farVal(good.indexOfSlice(hexBytes("26000000"))) = 0x7E.toByte
    assert(MediaExtract.exifAscii(farVal, 10, farVal.length)
      == Some("Exif.010F=d7"))
    // non-ASCII type entries are not text
    val typ = good.clone()
    typ(22) = 3.toByte // Make entry type 2 -> 3 (SHORT), LE low byte
    assert(MediaExtract.exifAscii(typ, 10, typ.length)
      == Some("Exif.010E=hello world"))
    // truncated mid-IFD: entries beyond the cut are skipped, not read
    val cut = good.take(30)
    assert(MediaExtract.exifAscii(cut, 10, cut.length) == None)
  }

  test("interior NULs render '=' and the trailing NUL drops") {
    val t = tiffLe.clone()
    val at = t.indexOfSlice("hello world".getBytes)
    t(at + 5) = 0 // "hello\0world\0" -> "hello=world"
    assert(MediaExtract.exifAscii(app1(t), 10, app1(t).length)
      == Some("Exif.010F=d7; Exif.010E=hello=world"))
  }
}
