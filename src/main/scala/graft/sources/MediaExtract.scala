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
  * with the Spark plumbing real and the decoder STUBBED.
  *
  * Real: the `Dataset[MediaRecord]` schema (binary payload + typed
  * metadata), `mapPartitions` execution (per-partition batching — at
  * scale each batch is one model/decoder invocation, amortizing setup
  * the way the reference amortizes nothing), and the output encoder.
  * STUB: [[decodeStub]] replaces the network model call with a
  * deterministic digest-based fake — this container has no media libs
  * and the engine has zero egress.
  */
object MediaExtract {

  /** Records per decoder invocation (reference: one call per file). */
  val BatchSize = 16

  /** STUB decoder — deterministic fake standing in for the vision
    * model: kind, byte length, sha256 prefix of the payload.
    */
  def decodeStub(r: MediaRecord): String = {
    val digest = MessageDigest.getInstance("SHA-256").digest(r.payload)
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
        // one model call per batch would happen here
        batch.map(r => ExtractedText(r.doc_id, r.kind, r.payload.length.toLong,
          batch.size, decodeStub(r)))
      }
    }
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
