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
          batch.size, decodePngText(r.payload).getOrElse(decodeStub(r))))
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
    val recs = Tables.mediaText(s, d)
      .select(col("media_id").as("doc_id"),
        when(substring(hex(col("payload")), 1, 16) === "89504E470D0A1A0A",
          "image").otherwise("text").as("kind"),
        col("payload")).as[MediaRecord]
    extract(recs).toDF()
      .select(col("doc_id").as("media_id"), col("kind"), col("n_bytes"),
        col("text").as("extracted"))
      .orderBy(col("media_id"))
  }

  val mediaExtractSql: String = {
    def byteAt(off: String) = s"('0x' || substr(x.s, 2*($off) + 1, 2))::INT"
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
       |)
       |SELECT h.media_id,
       |       CASE WHEN substr(h.s, 1, 16) = '89504E470D0A1A0A'
       |            THEN 'image' ELSE 'text' END AS kind,
       |       h.n AS n_bytes,
       |       coalesce(t.txt,
       |         '[extracted ' ||
       |         CASE WHEN substr(h.s, 1, 16) = '89504E470D0A1A0A'
       |              THEN 'image' ELSE 'text' END ||
       |         ' ' || h.n || 'B ' || substr(sha256(h.s), 1, 16) || ']')
       |         AS extracted
       |FROM hx h LEFT JOIN png_txt t ON t.media_id = h.media_id
       |ORDER BY h.media_id""".stripMargin
  }

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
