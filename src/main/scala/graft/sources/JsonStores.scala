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

  /** First-run-safe manifest load — the reference's missing-manifest
    * default (`load_manifest` returns `{"files": {}}` when neither the
    * local file nor the s3 object exists, etl.py:190-204): an absent
    * path yields an empty, correctly-typed manifest, so the first
    * incremental run classifies everything `new` instead of crashing.
    */
  def loadManifestOrEmpty(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) loadManifest(spark, path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ManifestSchema)
  }

  /** Fault-tolerant JSONL chunk read with a quarantine side-output —
    * the reference's skip-and-continue on bad pages/blocks
    * (Notion_openai_vector_etl.py:497-504, 542-546) applied to ingest:
    * a corrupt line (unparseable JSON, or a record missing its
    * identity fields) lands in the quarantine frame with its raw text
    * instead of killing the 100 TB job; the good frame parses clean.
    *
    * The parsed frame is cached because Spark disallows filtering on
    * the internal corrupt-record column of an un-materialized scan.
    */
  def readChunksJsonlTolerant(spark: SparkSession,
    path: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val schema = ChunkSchema.add(StructField("_corrupt_record", StringType))
    val raw = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    val bad = col("_corrupt_record").isNotNull ||
      col("chunk_id").isNull || col("doc_id").isNull
    val good = raw.filter(!bad).drop("_corrupt_record")
    val quarantine = raw.filter(bad)
      .select(coalesce(col("_corrupt_record"),
        to_json(struct(ChunkSchema.fieldNames.map(col).toIndexedSeq: _*)))
        .as("raw_record"))
    (good, quarantine)
  }
}
