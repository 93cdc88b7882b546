package graft.sources

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoders}

/** Typed media metadata produced by the (stubbed) decoder. */
case class MediaMeta(doc_id: Long, kind: String, width: Int, height: Int,
  n_frames: Int)

/** Resized payload descriptor. */
case class ResizedMedia(doc_id: Long, kind: String, width: Int, height: Int,
  payload: Array[Byte])

/** Sampled frame: one row per kept frame. */
case class SampledFrame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

/** Fixed-dim feature vector extracted from a payload. */
case class MediaFeature(doc_id: Long, kind: String, feature: Array[Float])

/** Multimodal transform plumbing over opaque binary payloads:
  * decode-metadata, resize, frame-sample, feature-extract.
  *
  * The Spark side is real — typed schemas, `mapPartitions` batched
  * execution (one decoder/model invocation per batch at scale),
  * product encoders, deterministic outputs. The pixel/sample math is
  * STUBBED on payload digests (this container ships no image/audio
  * libraries and the engine has zero egress): every stub is a pure
  * function of the bytes, so pipelines built on these transforms are
  * fully testable and swap in a real decoder without touching any
  * Spark plumbing. Reference analogue: the vision-model extraction
  * call, Notion_openai_vector_etl.py:254-301.
  */
object MediaTransforms {

  val BatchSize: Int = MediaExtract.BatchSize
  val FeatureDim = 8

  private def digest(payload: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(payload)

  /** STUB dimension sniff: deterministic W×H×frames from the digest. */
  def metaStub(r: MediaRecord): MediaMeta = {
    val d = digest(r.payload)
    MediaMeta(r.doc_id, r.kind,
      width = 16 * (1 + (d(0) & 0x3f)),
      height = 16 * (1 + (d(1) & 0x3f)),
      n_frames = if (r.kind == "video") 1 + (d(2) & 0x7f) else 1)
  }

  def decodeMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map(metaStub)))
  }

  /** STUB resize to a bounding box, preserving the stubbed aspect
    * ratio; payload becomes a digest-seeded thumbnail surrogate.
    */
  def resize(ds: Dataset[MediaRecord], maxSide: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      val m = metaStub(r)
      val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
      ResizedMedia(r.doc_id, r.kind,
        math.max(1, (m.width * scale).toInt),
        math.max(1, (m.height * scale).toInt),
        digest(r.payload))
    }))
  }

  /** STUB frame sampling: every `stride`-th frame of the stubbed frame
    * count, payload = digest(frame_idx ++ payload). One output row per
    * frame — the explode happens inside the partition, no shuffle.
    */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int): Dataset[SampledFrame] = {
    implicit val enc = Encoders.product[SampledFrame]
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.flatMap { r =>
      val m = metaStub(r)
      (0 until m.n_frames by stride).map(i =>
        SampledFrame(r.doc_id, i, digest(i.toByte +: r.payload)))
    }))
  }

  /** STUB feature extraction: `FeatureDim` floats in [0,1) from the
    * digest — stands in for an embedding-model forward pass per batch.
    */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    implicit val enc = Encoders.product[MediaFeature]
    ds.mapPartitions(_.grouped(BatchSize).flatMap(_.map { r =>
      val d = digest(r.payload)
      MediaFeature(r.doc_id, r.kind,
        Array.tabulate(FeatureDim)(i => (d(i) & 0xff) / 256.0f))
    }))
  }
}
