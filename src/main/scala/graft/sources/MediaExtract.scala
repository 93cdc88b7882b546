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
    * keyword convention, applied uniformly). None when no COM text.
    */
  def decodeJpegText(p: Array[Byte]): Option[String] = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8)
      return None
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
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
          out += data.map(b => if (b == 0) '=' else (b & 0xFF).toChar).mkString
        }
        i += 2 + ln
      } else done = true
    }
    if (out.isEmpty) None else Some(out.mkString("; "))
  }

  /** Container-text extraction across every real rung (PNG tEXt,
    * JPEG COM) — the single entry [[extract]] consults before
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

  val mediaExtractSql: String = {
    def byteAt(off: String) = s"('0x' || substr(x.s, 2*($off) + 1, 2))::INT"
    val jln = "('0x' || substr(x.s, 2*w.p + 5, 4))::BIGINT"
    s"""WITH RECURSIVE ${Tables.mediaTextSql},
       |hx AS (
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
       |), jpeg_txt AS (
       |  SELECT media_id, string_agg(txt, '; ' ORDER BY p) AS txt
       |  FROM jtx GROUP BY media_id
       |), sniff AS (
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
  }

  /** q_media_text_census — the extraction-mix rollup: per container
    * rung (png / jpeg / none), how many payloads, how many yielded
    * REAL container text, and the total extracted character mass —
    * the one-line answer to "which rungs carry text and how much",
    * rolled up over the SAME extraction [[mediaExtract]] serves
    * row-level (stub rows contribute zero mass: the census counts
    * what the CONTAINERS yielded, not what the model fallback would
    * fabricate). The q_media_mix discipline applied to the
    * text-extraction stage.
    */
  def mediaTextCensus(s: SparkSession, d: String): org.apache.spark.sql.DataFrame =
    mediaExtract(s, d)
      .withColumn("is_text", col("container") =!= "none")
      .groupBy(col("container"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("is_text").cast("long")).cast("long").as("n_text_bearing"),
        sum(when(col("is_text"), length(col("extracted")).cast("long"))
          .otherwise(0L)).cast("long").as("extracted_chars"),
        sum(col("n_bytes")).cast("long").as("bytes"))
      .orderBy(col("container"))

  val mediaTextCensusSql: String =
    s"""SELECT container, count(*)::BIGINT AS n,
       |       sum((container <> 'none')::BIGINT)::BIGINT AS n_text_bearing,
       |       sum(CASE WHEN container <> 'none' THEN length(extracted)
       |                ELSE 0 END)::BIGINT AS extracted_chars,
       |       sum(n_bytes)::BIGINT AS bytes
       |FROM (
       |${mediaExtractSql.linesIterator.map("  " + _).mkString("\n")}
       |)
       |GROUP BY container
       |ORDER BY container""".stripMargin

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
