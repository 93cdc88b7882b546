package graft.sources

import java.security.MessageDigest

import graft.Tables
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque multimodal payload: bytes + typed metadata. */
case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

/** Extraction result; `batch_size` records the model-call batch the
  * row travelled in (the real batching shape, testable).
  */
case class ExtractedText(doc_id: Long, kind: String, n_bytes: Long,
  batch_size: Int, text: String)

/** Model-based text extraction over binary media columns — the
  * reference's GPT vision call (Notion_openai_vector_etl.py:254-301)
  * with the Spark plumbing real and ONE real extraction rung.
  *
  * Real: the `Dataset[MediaRecord]` schema (binary payload + typed
  * metadata), `mapPartitions` execution (per-partition batching — at
  * scale each batch is one model/decoder invocation, amortizing setup
  * the way the reference amortizes nothing), the output encoder, and
  * — since r9 — [[decodePngText]], a genuine container-text extractor
  * (PNG tEXt chunks, the metadata text real tools like exiftool pull)
  * that is output-verified against the DuckDB oracle
  * (`q_media_extract`). STUB: [[decodeStub]] stands in for the
  * network vision model on payloads with no extractable container
  * text — this container has no media libs and the engine has zero
  * egress; the stub is itself deterministic and oracle-mirrored.
  */
object MediaExtract {

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** REAL extraction: text carried in PNG `tEXt` chunks (PNG spec
    * 11.3.4.3 — keyword, NUL separator, Latin-1 text, uncompressed).
    * Walks the chunk chain by length arithmetic (never trusting more
    * than the header: truncated or corrupt chunks end the walk, a
    * chunk whose data runs past the payload is skipped — total at
    * 100 TB where some payloads WILL be garbage), stops at IEND, and
    * renders each chunk as `keyword=value` joined by `"; "` in chunk
    * order. CRCs are skipped, not verified — extraction tools read
    * metadata from files whose image data they never decode. Returns
    * None when no tEXt chunk yields text (not a PNG, no tEXt, all out
    * of bounds) — the caller falls back to the model stub.
    */
  def decodePngText(p: Array[Byte]): Option[String] = {
    if (p.length < 20 || !p.take(8).sameElements(PngSig)) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 8L
    var done = false
    while (!done && i + 8 <= p.length) {
      val q = i.toInt
      val len = ((p(q) & 0xFFL) << 24) | ((p(q + 1) & 0xFFL) << 16) |
        ((p(q + 2) & 0xFFL) << 8) | (p(q + 3) & 0xFFL)
      val ty = new String(p.slice(q + 4, q + 8), "ISO-8859-1")
      if (ty == "IEND") done = true
      else {
        if (ty == "tEXt" && i + 8 + len <= p.length) {
          val data = p.slice(q + 8, q + 8 + len.toInt)
          // NUL keyword/text separator rendered as '='; bytes are
          // Latin-1 per spec, so (b & 0xFF).toChar IS the code point
          out += data.map(b => if (b == 0) '=' else (b & 0xFF).toChar).mkString
        }
        i = i + 12 + len
      }
    }
    if (out.isEmpty) None else Some(out.mkString("; "))
  }

  /** REAL extraction, second container family: text carried in JPEG
    * COM segments (ITU T.81 B.2.4.5 — marker 0xFFFE, 2-byte
    * big-endian length INCLUDING the length field, then comment
    * bytes). Walks the marker chain from SOI: any number of B.1.1.2
    * fill bytes (0xFF) may pad a marker and are skipped one at a
    * time; standalone markers (TEM, RSTn) carry no length; the walk
    * stops at EOI or SOS (entropy-coded data follows SOS — metadata
    * extractors never decode it) and at any truncation (a segment
    * whose declared length runs past the payload is skipped, the
    * walk ends at the buffer edge — the 100 TB garbage-tolerance
    * rule, same as [[decodePngText]]). NULs render as '=' (the PNG
    * keyword convention, applied uniformly). Since r11 the same walk
    * also yields EXIF APP1 ASCII tags ([[exifAscii]], third rung);
    * segments merge in stream order. None when no segment yields.
    */
  def decodeJpegText(p: Array[Byte]): Option[String] = {
    val segs = jpegTextSegments(p)
    if (segs.isEmpty) None else Some(segs.map(_._3).mkString("; "))
  }

  /** COM-only / EXIF-only views of the same walk — the per-rung
    * census ([[mediaTextCensus]]) counts each rung's own yield.
    */
  def decodeJpegCom(p: Array[Byte]): Option[String] = {
    val t = jpegTextSegments(p).collect { case (_, "com", s) => s }
    if (t.isEmpty) None else Some(t.mkString("; "))
  }

  def decodeJpegExif(p: Array[Byte]): Option[String] = {
    val t = jpegTextSegments(p).collect { case (_, "exif", s) => s }
    if (t.isEmpty) None else Some(t.mkString("; "))
  }

  private val ExifHdr =
    Array(0x45, 0x78, 0x69, 0x66, 0x00, 0x00).map(_.toByte) // "Exif\0\0"

  /** The JPEG marker walk yielding `(position, rung, text)` in stream
    * order, rung ∈ {com, exif}: COM segments render as before; an
    * APP1 segment (0xFFE1) opening with the "Exif\0\0" header hands
    * its TIFF body to [[exifAscii]] (third extraction rung, r10
    * verdict item 3). Same truncation tolerance as the single-rung
    * walks: a segment whose declared length runs past the payload is
    * skipped and the walk ends at the buffer edge.
    */
  def jpegTextSegments(p: Array[Byte]): Seq[(Int, String, String)] = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8)
      return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var i = 2
    var done = false
    while (!done && i + 2 <= p.length && (p(i) & 0xFF) == 0xFF) {
      val m = p(i + 1) & 0xFF
      if (m == 0xFF) i += 1 // fill byte
      else if (m == 0xD9 || m == 0xDA) done = true // EOI / SOS
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone
      else if (i + 4 <= p.length) {
        val ln = ((p(i + 2) & 0xFF) << 8) | (p(i + 3) & 0xFF)
        if (m == 0xFE && ln >= 2 && i + 2 + ln <= p.length) {
          val data = p.slice(i + 4, i + 2 + ln)
          out += ((i, "com",
            data.map(b => if (b == 0) '=' else (b & 0xFF).toChar).mkString))
        } else if (m == 0xE1 && ln >= 16 && i + 2 + ln <= p.length &&
          p.slice(i + 4, i + 10).sameElements(ExifHdr)) {
          exifAscii(p, i + 10, i + 2 + ln).foreach(t => out += ((i, "exif", t)))
        }
        i += 2 + ln
      } else done = true
    }
    out.toSeq
  }

  /** REAL extraction, third container rung: ASCII tags of an EXIF
    * IFD0 (TIFF 6.0 §2 + EXIF 2.3 §4.5.2) inside a JPEG APP1
    * segment — the Make / ImageDescription / Artist class of
    * metadata exiftool prints. `tb` is the TIFF header base (both
    * byte orders handled — II little- and MM big-endian, decided by
    * the header the data actually carries), `end` the exclusive
    * segment bound; every offset is validated against it before any
    * read (IFD count, each 12-byte entry, each value run — out of
    * bounds skips the tag or the IFD, never throws: the 100 TB
    * garbage rule). Only type-2 (ASCII) tags are text; the trailing
    * NUL the spec mandates is dropped, interior NULs render '=' (the
    * house convention). Tags render `Exif.<TAG4HEX>=<text>` in entry
    * order, joined "; ".
    */
  def exifAscii(p: Array[Byte], tb: Int, end: Int): Option[String] = {
    def u16(o: Long, le: Boolean): Long = {
      val q = o.toInt
      if (le) (p(q) & 0xFFL) | ((p(q + 1) & 0xFFL) << 8)
      else ((p(q) & 0xFFL) << 8) | (p(q + 1) & 0xFFL)
    }
    def u32(o: Long, le: Boolean): Long = {
      val q = o.toInt
      if (le) (p(q) & 0xFFL) | ((p(q + 1) & 0xFFL) << 8) |
        ((p(q + 2) & 0xFFL) << 16) | ((p(q + 3) & 0xFFL) << 24)
      else ((p(q) & 0xFFL) << 24) | ((p(q + 1) & 0xFFL) << 16) |
        ((p(q + 2) & 0xFFL) << 8) | (p(q + 3) & 0xFFL)
    }
    if (tb + 8 > end) return None
    val le = (p(tb) & 0xFF) == 0x49 && (p(tb + 1) & 0xFF) == 0x49
    val be = (p(tb) & 0xFF) == 0x4D && (p(tb + 1) & 0xFF) == 0x4D
    if ((!le && !be) || u16(tb + 2L, le) != 42L) return None
    val ifd = tb + u32(tb + 4L, le)
    if (ifd + 2 > end) return None
    val cnt = u16(ifd, le)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (i <- 0L until cnt) {
      val ep = ifd + 2 + 12 * i
      if (ep + 12 <= end) {
        val tag = u16(ep, le)
        val typ = u16(ep + 2, le)
        val n = u32(ep + 4, le)
        if (typ == 2L && n >= 1L) {
          val start = if (n <= 4L) ep + 8 else tb + u32(ep + 8, le)
          if (start >= tb && start + n <= end) {
            val txt = p.slice(start.toInt, (start + n - 1).toInt)
              .map(b => if (b == 0) '=' else (b & 0xFF).toChar).mkString
            out += f"Exif.$tag%04X=$txt"
          }
        }
      }
    }
    if (out.isEmpty) None else Some(out.mkString("; "))
  }

  /** Container-text extraction across every real rung (PNG tEXt,
    * JPEG COM + EXIF) — the single entry [[extract]] consults before
    * falling back to the model stub.
    */
  def decodeContainerText(p: Array[Byte]): Option[String] =
    decodePngText(p).orElse(decodeJpegText(p))

  /** Records per decoder invocation (reference: one call per file). */
  val BatchSize = 16

  /** STUB decoder — deterministic fake standing in for the vision
    * model: kind, byte length, sha256 prefix of the HEX-encoded
    * payload (hex, not raw bytes, so the DuckDB oracle — whose sha256
    * takes VARCHAR only — mirrors it exactly).
    */
  def decodeStub(r: MediaRecord): String = {
    val hexPayload = r.payload.map(b => f"$b%02X").mkString
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(hexPayload.getBytes("UTF-8"))
    val hex = digest.take(8).map(b => f"$b%02x").mkString
    s"[extracted ${r.kind} ${r.payload.length}B $hex]"
  }

  /** Batched extraction: partitions stream through in `BatchSize`
    * groups; one (stubbed) decoder call per group.
    */
  def extract(ds: Dataset[MediaRecord]): Dataset[ExtractedText] = {
    implicit val enc = Encoders.product[ExtractedText]
    ds.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // one model call per batch would happen here for the rows the
        // real container extractor can't serve
        batch.map(r => ExtractedText(r.doc_id, r.kind, r.payload.length.toLong,
          batch.size, decodeContainerText(r.payload).getOrElse(decodeStub(r))))
      }
    }
  }

  /** q_media_extract — extraction output-verified end to end over the
    * [[graft.Tables.mediaText]] corpus: PNG payloads yield their real
    * tEXt metadata (`Title=<source>; Comment=<first 40 chars>` on the
    * fixture — but the extractor is the general chunk walk, not a
    * fixture-shaped regex), containerless payloads take the
    * deterministic model stub. Runs through [[extract]]'s REAL
    * batched `mapPartitions` plumbing; the partition-dependent
    * `batch_size` diagnostic is dropped from the oracle projection
    * (row values must not depend on partitioning). Scale: one
    * narrow map over the payload column, no shuffle until the final
    * presentation sort.
    */
  def mediaExtract(s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    implicit val enc = Encoders.product[MediaRecord]
    // kind carries the sniffed CONTAINER ('png'/'jpeg'/'text') through
    // the extraction batch; the presentation projects it back to the
    // modality + a container census column (the per-rung count the mix
    // report rolls up)
    val recs = Tables.mediaText(s, d)
      .select(col("media_id").as("doc_id"),
        when(substring(hex(col("payload")), 1, 16) === "89504E470D0A1A0A", "png")
          .when(substring(hex(col("payload")), 1, 4) === "FFD8", "jpeg")
          .otherwise("text").as("kind"),
        col("payload")).as[MediaRecord]
    extract(recs).toDF()
      .select(col("doc_id").as("media_id"),
        when(col("kind").isin("png", "jpeg"), "image").otherwise("text")
          .as("kind"),
        when(col("kind").isin("png", "jpeg"), col("kind")).otherwise("none")
          .as("container"),
        col("n_bytes"), col("text").as("extracted"))
      .orderBy(col("media_id"))
  }

  /** Endian-aware 16/32-bit reads over carried columns `s` (hex
    * string) and `le` (bool) — the oracle mirror of [[exifAscii]]'s
    * u16/u32 (II reverses bytes, MM reads straight).
    */
  private def u16e(off: String) =
    s"(CASE WHEN le THEN ('0x' || substr(s, 2*(($off)+1) + 1, 2) ||" +
      s" substr(s, 2*($off) + 1, 2))::BIGINT" +
      s" ELSE ('0x' || substr(s, 2*($off) + 1, 4))::BIGINT END)"

  private def u32e(off: String) =
    s"(CASE WHEN le THEN ('0x' || substr(s, 2*(($off)+3) + 1, 2) ||" +
      s" substr(s, 2*(($off)+2) + 1, 2) || substr(s, 2*(($off)+1) + 1, 2) ||" +
      s" substr(s, 2*($off) + 1, 2))::BIGINT" +
      s" ELSE ('0x' || substr(s, 2*($off) + 1, 8))::BIGINT END)"

  /** The shared walk CTE block (PNG chunk walk + JPEG marker walk +
    * EXIF IFD parse + per-rung text aggregates) — both the row-level
    * extraction oracle and the rung census build on it. Emits:
    * `hx(media_id, s, n)`, `png_txt`, `com_txt`, `exif_txt` (per-rung
    * yields) and `jpeg_txt` (COM + EXIF merged in stream order — what
    * the Scala walk returns row-level).
    */
  private val walkCtes: String = {
    def byteAt(off: String) = s"('0x' || substr(x.s, 2*($off) + 1, 2))::INT"
    def byteAtS(off: String) = s"('0x' || substr(s, 2*($off) + 1, 2))::INT"
    val jln = "('0x' || substr(x.s, 2*w.p + 5, 4))::BIGINT"
    s"""hx AS (
       |  SELECT media_id, hex(payload) AS s,
       |         octet_length(payload)::BIGINT AS n
       |  FROM mediat
       |), wk(media_id, p, len, ty) AS (
       |  SELECT media_id, 8::BIGINT,
       |         ('0x' || substr(s, 17, 8))::BIGINT, substr(s, 25, 8)
       |  FROM hx WHERE n >= 20 AND substr(s, 1, 16) = '89504E470D0A1A0A'
       |  UNION ALL
       |  SELECT w.media_id, w.np,
       |         ('0x' || substr(x.s, 2*w.np + 1, 8))::BIGINT,
       |         substr(x.s, 2*w.np + 9, 8)
       |  FROM (SELECT media_id, p + 12 + len AS np
       |        FROM wk WHERE ty <> '49454E44') w
       |  JOIN hx x ON x.media_id = w.media_id
       |  WHERE w.np + 8 <= x.n
       |), tx AS (
       |  SELECT w.media_id, w.p,
       |    array_to_string([CASE WHEN ${byteAt("w.p + 8 + i")} = 0 THEN '='
       |                     ELSE chr(${byteAt("w.p + 8 + i")}) END
       |                     for i in range(0, w.len)], '') AS txt
       |  FROM wk w JOIN hx x ON x.media_id = w.media_id
       |  WHERE w.ty = '74455874' AND w.p + 8 + w.len <= x.n
       |), png_txt AS (
       |  SELECT media_id, string_agg(txt, '; ' ORDER BY p) AS txt
       |  FROM tx GROUP BY media_id
       |), jw(media_id, p) AS (
       |  SELECT media_id, 2::BIGINT
       |  FROM hx WHERE n >= 4 AND substr(s, 1, 4) = 'FFD8'
       |  UNION ALL
       |  SELECT j.media_id,
       |         CASE WHEN j.mk = 'FF' THEN j.p + 1
       |              WHEN j.mk = '01'
       |                   OR (j.mk >= 'D0' AND j.mk <= 'D7') THEN j.p + 2
       |              ELSE j.p + 2 + j.ln END
       |  FROM (SELECT w.media_id, w.p, x.n,
       |               substr(x.s, 2*w.p + 3, 2) AS mk,
       |               CASE WHEN w.p + 4 <= x.n
       |                    THEN $jln ELSE 0::BIGINT END AS ln
       |        FROM jw w JOIN hx x ON x.media_id = w.media_id
       |        WHERE w.p + 2 <= x.n
       |          AND substr(x.s, 2*w.p + 1, 2) = 'FF') j
       |  WHERE j.mk <> 'D9' AND j.mk <> 'DA'
       |    AND (j.mk = 'FF' OR j.mk = '01'
       |         OR (j.mk >= 'D0' AND j.mk <= 'D7') OR j.p + 4 <= j.n)
       |), jtx AS (
       |  SELECT w.media_id, w.p,
       |    array_to_string([CASE WHEN ${byteAt("w.p + 4 + i")} = 0 THEN '='
       |                     ELSE chr(${byteAt("w.p + 4 + i")}) END
       |                     for i in range(0, $jln - 2)], '') AS txt
       |  FROM jw w JOIN hx x ON x.media_id = w.media_id
       |  WHERE w.p + 4 <= x.n AND substr(x.s, 2*w.p + 1, 4) = 'FFFE'
       |    AND $jln >= 2 AND w.p + 2 + $jln <= x.n
       |), ex0 AS (
       |  SELECT w.media_id, w.p, x.s, w.p + 10 AS tb,
       |         w.p + 2 + $jln AS fin,
       |         substr(x.s, 2*(w.p + 10) + 1, 4) AS bom
       |  FROM jw w JOIN hx x ON x.media_id = w.media_id
       |  WHERE w.p + 4 <= x.n AND substr(x.s, 2*w.p + 1, 4) = 'FFE1'
       |    AND $jln >= 16 AND w.p + 2 + $jln <= x.n
       |    AND substr(x.s, 2*(w.p + 4) + 1, 12) = '457869660000'
       |), ex1 AS (
       |  SELECT media_id, p, s, tb, fin, (bom = '4949') AS le
       |  FROM ex0 WHERE bom IN ('4949', '4D4D') AND tb + 8 <= fin
       |), ex2 AS (
       |  SELECT media_id, p, s, tb, fin, le, tb + ${u32e("tb + 4")} AS ifd
       |  FROM ex1 WHERE ${u16e("tb + 2")} = 42
       |), ex3 AS (
       |  SELECT media_id, p, s, tb, fin, le, ifd,
       |         unnest(range(0, CASE WHEN ifd + 2 <= fin
       |                       THEN ${u16e("ifd")} ELSE 0 END)) AS i
       |  FROM ex2
       |), ex4 AS (
       |  SELECT media_id, p, s, tb, fin, le, i, ep,
       |         ${u16e("ep + 2")} AS typ, ${u32e("ep + 4")} AS cnt,
       |         CASE WHEN le THEN substr(s, 2*ep + 3, 2) || substr(s, 2*ep + 1, 2)
       |              ELSE substr(s, 2*ep + 1, 4) END AS taghex,
       |         CASE WHEN ${u32e("ep + 4")} <= 4 THEN ep + 8
       |              ELSE tb + ${u32e("ep + 8")} END AS vstart
       |  FROM (SELECT *, ifd + 2 + 12*i AS ep FROM ex3)
       |  WHERE ep + 12 <= fin
       |), ex5 AS (
       |  SELECT media_id, p, i, 'Exif.' || taghex || '=' ||
       |    array_to_string([CASE WHEN ${byteAtS("vstart + k")} = 0 THEN '='
       |                     ELSE chr(${byteAtS("vstart + k")}) END
       |                     for k in range(0, cnt - 1)], '') AS txt
       |  FROM ex4
       |  WHERE typ = 2 AND cnt >= 1 AND vstart >= tb AND vstart + cnt <= fin
       |), exif_seg AS (
       |  SELECT media_id, p, string_agg(txt, '; ' ORDER BY i) AS txt
       |  FROM ex5 GROUP BY media_id, p
       |), jseg AS (
       |  SELECT media_id, p, txt FROM jtx
       |  UNION ALL
       |  SELECT media_id, p, txt FROM exif_seg
       |), jpeg_txt AS (
       |  SELECT media_id, string_agg(txt, '; ' ORDER BY p) AS txt
       |  FROM jseg GROUP BY media_id
       |), com_txt AS (
       |  SELECT media_id, string_agg(txt, '; ' ORDER BY p) AS txt
       |  FROM jtx GROUP BY media_id
       |), exif_txt AS (
       |  SELECT media_id, string_agg(txt, '; ' ORDER BY p) AS txt
       |  FROM exif_seg GROUP BY media_id
       |)""".stripMargin
  }

  val mediaExtractSql: String =
    s"""WITH RECURSIVE ${Tables.mediaTextSql},
       |$walkCtes,
       |sniff AS (
       |  SELECT media_id, s, n,
       |         CASE WHEN substr(s, 1, 16) = '89504E470D0A1A0A' THEN 'png'
       |              WHEN substr(s, 1, 4) = 'FFD8' THEN 'jpeg'
       |              ELSE 'text' END AS container
       |  FROM hx
       |)
       |SELECT h.media_id,
       |       CASE WHEN h.container IN ('png', 'jpeg')
       |            THEN 'image' ELSE 'text' END AS kind,
       |       CASE WHEN h.container IN ('png', 'jpeg')
       |            THEN h.container ELSE 'none' END AS container,
       |       h.n AS n_bytes,
       |       coalesce(t.txt, j.txt,
       |         '[extracted ' || h.container ||
       |         ' ' || h.n || 'B ' || substr(sha256(h.s), 1, 16) || ']')
       |         AS extracted
       |FROM sniff h
       |LEFT JOIN png_txt t ON t.media_id = h.media_id
       |LEFT JOIN jpeg_txt j ON j.media_id = h.media_id
       |ORDER BY h.media_id""".stripMargin

  /** q_media_text_census — the extraction-mix rollup, per EXTRACTION
    * RUNG since r11 (png_text tEXt / jpeg_com / jpeg_exif / none —
    * the r10 census keyed on the container, which could not see that
    * one jpeg yields through two independent rungs): per rung, how
    * many payloads yielded, the character mass yielded, and the
    * payload bytes behind it — the one-line answer to "which rungs
    * carry text and how much". A payload counts under every rung
    * that yields for it; `none` collects payloads no rung serves
    * (the model-stub population). Runs the same walk kernels
    * [[mediaExtract]] serves row-level. Scale: one narrow map over
    * the payload column, a ≤4-group fold after it.
    */
  def mediaTextCensus(s: SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.mediaText(s, d)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (_, p) =>
        val rungs = Seq(
          "png_text" -> decodePngText(p),
          "jpeg_com" -> decodeJpegCom(p),
          "jpeg_exif" -> decodeJpegExif(p))
        val hit = rungs.collect { case (r, Some(t)) =>
          (r, t.length.toLong, p.length.toLong) }
        if (hit.isEmpty) Seq(("none", 0L, p.length.toLong)) else hit
      }
      .toDF("rung", "chars", "bytes")
      .groupBy(col("rung"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("chars")).cast("long").as("chars"),
        sum(col("bytes")).cast("long").as("bytes"))
      .orderBy(col("rung"))
  }

  val mediaTextCensusSql: String =
    s"""WITH RECURSIVE ${Tables.mediaTextSql},
       |$walkCtes,
       |rungs AS (
       |  SELECT 'jpeg_com' AS rung, t.txt, h.n
       |  FROM com_txt t JOIN hx h ON h.media_id = t.media_id
       |  UNION ALL
       |  SELECT 'jpeg_exif', t.txt, h.n
       |  FROM exif_txt t JOIN hx h ON h.media_id = t.media_id
       |  UNION ALL
       |  SELECT 'png_text', t.txt, h.n
       |  FROM png_txt t JOIN hx h ON h.media_id = t.media_id
       |), hits AS (
       |  SELECT DISTINCT media_id FROM (
       |    SELECT media_id FROM com_txt
       |    UNION ALL SELECT media_id FROM exif_txt
       |    UNION ALL SELECT media_id FROM png_txt)
       |)
       |SELECT rung, count(*)::BIGINT AS n, sum(chars)::BIGINT AS chars,
       |       sum(bytes)::BIGINT AS bytes
       |FROM (
       |  SELECT rung, length(txt)::BIGINT AS chars, n AS bytes FROM rungs
       |  UNION ALL
       |  SELECT 'none', 0::BIGINT, h.n FROM hx h
       |  WHERE h.media_id NOT IN (SELECT media_id FROM hits)
       |)
       |GROUP BY rung
       |ORDER BY rung""".stripMargin

  /** Media ingest from the documents table: payload = UTF-8 bytes,
    * kind by the same sniff rule as `q_media_meta`.
    */
  def fromDocuments(s: SparkSession, d: String): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    Tables.documents(s, d)
      .select(col("doc_id"),
        when(length(col("text")) % 3 === 0, "image")
          .when(length(col("text")) % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }
}
