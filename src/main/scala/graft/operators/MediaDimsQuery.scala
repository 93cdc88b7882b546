package graft.operators

import graft.Tables
import graft.functions.MediaDims
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q_media_dims — container width/height/type over the binary media
  * corpus via the codegen'd header parse
  * ([[graft.functions.MediaDims]]): the filter every multimodal
  * curation pass runs FIRST (drop sub-64px thumbnails and
  * unrecognized byte-noise before paying for perceptual hashing —
  * `small` is that predicate, materialized).
  *
  * Scale shape: ONE expression over the scan, payloads never shuffle
  * (the [[MediaDedup]] rule); the packed-long decompose is pure
  * column arithmetic. The DuckDB oracle re-implements the parse as
  * hex-substring integer arithmetic — fixed offsets for PNG IHDR, a
  * recursive-CTE marker walk for JPEG (the COM segment in the
  * fixture has data-dependent length, so the oracle cannot cheat
  * with a fixed offset either).
  */
object MediaDimsQuery {

  def mediaDims(s: SparkSession, d: String): DataFrame =
    Tables.mediaHeaders(s, d)
      .select(col("media_id"), MediaDims.dims(col("payload")).as("v"))
      .select(col("media_id"),
        when(expr("shiftright(v, 48)") === MediaDims.FmtPng, "png")
          .when(expr("shiftright(v, 48)") === MediaDims.FmtJpeg, "jpeg")
          .as("fmt"),
        when(col("v") =!= 0L, expr("shiftright(v, 24) % 16777216")).as("width"),
        when(col("v") =!= 0L, expr("v % 16777216")).as("height"))
      .withColumn("small",
        when(col("fmt").isNotNull, col("width") < 64L || col("height") < 64L))
      .drop("v")
      .orderBy(col("media_id"))

  /** q_media_audio — sample rate / channels / bit depth from the
    * RIFF/WAVE `fmt ` chunk (same codegen'd [[MediaDims]] expression,
    * fmt 3; the JUNK chunk in the fixture forces a real chunk walk
    * with odd-size padding). The audio analogue of the thumbnail
    * filter: drop 8 kHz mono before paying for feature extraction.
    */
  def mediaAudio(s: SparkSession, d: String): DataFrame =
    Tables.mediaAudio(s, d)
      .select(col("media_id"), MediaDims.dims(col("payload")).as("v"))
      .select(col("media_id"),
        when(expr("shiftright(v, 48)") === MediaDims.FmtWav, "wav").as("fmt"),
        when(col("v") =!= 0L, expr("shiftright(v, 24) % 16777216"))
          .as("sample_rate"),
        when(col("v") =!= 0L, expr("shiftright(v, 8) % 256")).as("channels"),
        when(col("v") =!= 0L, expr("v % 256")).as("bits"))
      .orderBy(col("media_id"))

  val mediaAudioSql: String = {
    def b(i: String) = s"('0x' || substr(x.s, 2*(g.p+$i)+1, 2))::BIGINT"
    s"""WITH RECURSIVE ${Tables.mediaAudioSql},
       |hx AS (
       |  SELECT media_id, hex(payload) AS s,
       |         octet_length(payload)::BIGINT AS n
       |  FROM mediaa
       |), rw(media_id, p, rate, ch, bits) AS (
       |  SELECT media_id, 12::BIGINT, NULL::BIGINT, NULL::BIGINT, NULL::BIGINT
       |  FROM hx
       |  WHERE n >= 12 AND substr(s, 1, 8) = '52494646'
       |    AND substr(s, 17, 8) = '57415645'
       |  UNION ALL
       |  SELECT media_id,
       |    CASE WHEN isfmt THEN -1 ELSE p + 8 + sz + (sz % 2) END,
       |    CASE WHEN isfmt THEN r END,
       |    CASE WHEN isfmt THEN c END,
       |    CASE WHEN isfmt THEN bb END
       |  FROM (
       |    SELECT g.media_id, g.p, x.n,
       |      (substr(x.s, 2*g.p+1, 8) = '666D7420' AND g.p + 24 <= x.n)
       |        AS isfmt,
       |      ${b("4")} + 256*${b("5")} + 65536*${b("6")}
       |        + 16777216*${b("7")} AS sz,
       |      ${b("12")} + 256*${b("13")} + 65536*${b("14")}
       |        + 16777216*${b("15")} AS r,
       |      ${b("10")} + 256*${b("11")} AS c,
       |      ${b("22")} + 256*${b("23")} AS bb
       |    FROM rw g JOIN hx x ON x.media_id = g.media_id
       |    WHERE g.p >= 0 AND g.rate IS NULL AND g.p + 8 <= x.n
       |  ) WHERE isfmt OR sz <= n
       |), parsed AS (
       |  SELECT media_id, rate, ch, bits FROM rw WHERE rate IS NOT NULL
       |)
       |SELECT m.media_id,
       |       CASE WHEN p.rate IS NOT NULL THEN 'wav' END AS fmt,
       |       p.rate AS sample_rate, p.ch AS channels, p.bits AS bits
       |FROM hx m LEFT JOIN parsed p ON p.media_id = m.media_id
       |ORDER BY m.media_id""".stripMargin
  }

  val mediaDimsSql: String =
    s"""WITH RECURSIVE ${Tables.mediaHeadersSql},
       |hx AS (
       |  SELECT media_id, hex(payload) AS s,
       |         octet_length(payload)::BIGINT AS n
       |  FROM mediah
       |), seg(media_id, p, done_fmt, done_w, done_h) AS (
       |  SELECT media_id, 2::BIGINT, NULL::VARCHAR, NULL::BIGINT, NULL::BIGINT
       |  FROM hx WHERE n >= 4 AND substr(s, 1, 4) = 'FFD8'
       |  UNION ALL
       |  SELECT media_id,
       |    CASE WHEN mk IN ('C0', 'C1', 'C2') THEN -1
       |         ELSE p + 2 + ('0x' || substr(s, 2*p+5, 4))::BIGINT END,
       |    CASE WHEN mk IN ('C0', 'C1', 'C2') THEN 'jpeg' END,
       |    CASE WHEN mk IN ('C0', 'C1', 'C2')
       |         THEN ('0x' || substr(s, 2*p+15, 4))::BIGINT END,
       |    CASE WHEN mk IN ('C0', 'C1', 'C2')
       |         THEN ('0x' || substr(s, 2*p+11, 4))::BIGINT END
       |  FROM (
       |    SELECT g.media_id, g.p, x.s, substr(x.s, 2*g.p+3, 2) AS mk
       |    FROM seg g JOIN hx x ON x.media_id = g.media_id
       |    WHERE g.p >= 0 AND g.done_fmt IS NULL AND g.p + 9 <= x.n
       |      AND substr(x.s, 2*g.p+1, 2) = 'FF'
       |  )
       |), jpeg AS (
       |  SELECT media_id, done_fmt AS fmt, done_w AS width, done_h AS height
       |  FROM seg WHERE done_fmt IS NOT NULL
       |), png AS (
       |  SELECT media_id, 'png' AS fmt,
       |         ('0x' || substr(s, 33, 8))::BIGINT AS width,
       |         ('0x' || substr(s, 41, 8))::BIGINT AS height
       |  FROM hx
       |  WHERE n >= 24 AND substr(s, 1, 16) = '89504E470D0A1A0A'
       |    AND substr(s, 25, 8) = '49484452'
       |), parsed AS (SELECT * FROM png UNION ALL SELECT * FROM jpeg)
       |SELECT m.media_id, p.fmt, p.width, p.height,
       |       CASE WHEN p.fmt IS NOT NULL
       |            THEN p.width < 64 OR p.height < 64 END AS small
       |FROM hx m LEFT JOIN parsed p ON p.media_id = m.media_id
       |ORDER BY m.media_id""".stripMargin
}
