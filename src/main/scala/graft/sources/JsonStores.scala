package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** The reference's two JSON persistence surfaces as Spark sources.
  *
  * - Chunk batches ship as JSONL (`upload_chunks_jsonl`,
  *   Notion_openai_vector_etl.py:329-344: one JSON record per chunk,
  *   batched). Spark's json source IS line-delimited by default, so a
  *   partitioned write is the distributed analogue of the reference's
  *   batch files — one file per partition, `maxRecordsPerFile` caps
  *   batch size like the reference's batching loop.
  * - The manifest persists as JSON keyed by source id
  *   (`load_manifest`/`save_manifest`, etl.py:190-216). Explicit
  *   schema on read: schema inference is a full extra pass over the
  *   data at scale, and silently types a corrupt manifest as strings.
  */
object JsonStores {

  val ManifestSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("content_hash", StringType, nullable = false),
    StructField("last_edited", LongType, nullable = false)))

  val ChunkSchema: StructType = StructType(Seq(
    StructField("chunk_id", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("chunk_index", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  /** JSONL chunk-batch writer; `recordsPerFile` mirrors the reference's
    * upload batch size.
    */
  def writeChunksJsonl(chunks: DataFrame, path: String,
    recordsPerFile: Int = 1000): Unit =
    chunks.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", recordsPerFile.toString)
      .json(path)

  def readChunksJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ChunkSchema).json(path)

  def saveManifest(manifest: DataFrame, path: String): Unit =
    manifest.write.mode(SaveMode.Overwrite).json(path)

  def loadManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ManifestSchema).json(path)
}
