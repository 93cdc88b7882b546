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
          .when(expr("shiftright(v, 48)") === MediaDims.FmtGif, "gif")
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

  /** q_media_video — brand / timescale / duration from the MP4
    * ISO-BMFF box chain (codegen'd [[graft.functions.Mp4Meta]]: a
    * top-level walk to `moov` past data-dependent `free` boxes, then
    * a child walk to `mvhd`, version 0 and 1 layouts). `duration_ms`
    * is the derived filter column and `short` the sub-3-second drop
    * predicate — the video analogue of the thumbnail filter. Brand
    * is native column arithmetic over the ftyp box (no custom code).
    * One expression over the scan; payloads never shuffle.
    */
  def mediaVideo(s: SparkSession, d: String): DataFrame =
    Tables.mediaVideo(s, d)
      .select(col("media_id"), col("payload"),
        graft.functions.Mp4Meta.mvhd(col("payload")).as("v"))
      .select(col("media_id"),
        when(col("v") =!= 0L, "mp4").as("fmt"),
        when(col("v") =!= 0L &&
          hex(substring(col("payload"), 5, 4)) === "66747970",
          decode(substring(col("payload"), 9, 4), "UTF-8")).as("brand"),
        when(col("v") =!= 0L, expr("shiftright(v, 32)")).as("timescale"),
        when(col("v") =!= 0L, expr("v % 4294967296")).as("duration"))
      .withColumn("duration_ms",
        when(col("timescale") > 0L,
          expr("(duration * 1000) div timescale")))
      .withColumn("short",
        when(col("fmt").isNotNull, col("duration_ms") < 3000L))
      .orderBy(col("media_id"))

  val mediaVideoSql: String = {
    def be32(off: String) = s"('0x' || substr(x.s, 2*(g.p+$off)+1, 8))::BIGINT"
    s"""WITH RECURSIVE ${Tables.mediaVideoSql},
       |hx AS (
       |  SELECT media_id, hex(payload) AS s,
       |         octet_length(payload)::BIGINT AS n
       |  FROM mediav
       |), wk(media_id, p, lim, inm, ts, dur) AS (
       |  SELECT media_id, 0::BIGINT, n, FALSE, NULL::BIGINT, NULL::BIGINT
       |  FROM hx
       |  UNION ALL
       |  SELECT media_id,
       |    CASE WHEN ismoov THEN p + 8
       |         WHEN ismvhd OR sz < 8 THEN -1
       |         ELSE p + sz END,
       |    CASE WHEN ismoov THEN p + sz ELSE lim END,
       |    inm OR ismoov,
       |    CASE WHEN ismvhd THEN
       |      CASE WHEN ver = 0 AND p + 28 <= lim THEN ts0
       |           WHEN ver = 1 AND p + 40 <= lim THEN ts1 END END,
       |    CASE WHEN ismvhd THEN
       |      CASE WHEN ver = 0 AND p + 28 <= lim THEN du0
       |           WHEN ver = 1 AND p + 40 <= lim THEN du1 END END
       |  FROM (
       |    SELECT g.media_id, g.p, g.lim, g.inm, x.n,
       |      ${be32("0")} AS sz,
       |      (NOT g.inm AND substr(x.s, 2*g.p+9, 8) = '6D6F6F76'
       |        AND ${be32("0")} >= 8
       |        AND g.p + ${be32("0")} <= x.n) AS ismoov,
       |      (g.inm AND substr(x.s, 2*g.p+9, 8) = '6D766864'
       |        AND ${be32("0")} >= 8) AS ismvhd,
       |      CASE WHEN g.p + 9 <= g.lim
       |           THEN ('0x' || substr(x.s, 2*g.p+17, 2))::BIGINT END AS ver,
       |      CASE WHEN g.p + 28 <= g.lim THEN ${be32("20")} END AS ts0,
       |      CASE WHEN g.p + 28 <= g.lim THEN ${be32("24")} END AS du0,
       |      CASE WHEN g.p + 40 <= g.lim THEN ${be32("28")} END AS ts1,
       |      CASE WHEN g.p + 40 <= g.lim THEN ${be32("36")} END AS du1
       |    FROM wk g JOIN hx x ON x.media_id = g.media_id
       |    WHERE g.p >= 0 AND g.ts IS NULL AND g.p + 8 <= g.lim
       |  )
       |), parsed AS (
       |  SELECT media_id, ts, dur FROM wk
       |  WHERE ts IS NOT NULL AND NOT (ts = 0 AND dur = 0)
       |)
       |SELECT m.media_id,
       |       CASE WHEN p.ts IS NOT NULL THEN 'mp4' END AS fmt,
       |       CASE WHEN p.ts IS NOT NULL AND substr(m.s, 9, 8) = '66747970'
       |            THEN decode(unhex(substr(m.s, 17, 8))) END AS brand,
       |       p.ts AS timescale, p.dur AS duration,
       |       CASE WHEN p.ts > 0 THEN (p.dur * 1000) // p.ts END AS duration_ms,
       |       CASE WHEN p.ts IS NOT NULL
       |            THEN (CASE WHEN p.ts > 0 THEN (p.dur * 1000) // p.ts END) < 3000
       |            END AS short
       |FROM hx m LEFT JOIN parsed p ON p.media_id = m.media_id
       |ORDER BY m.media_id""".stripMargin
  }

  /** q_media_mix — the multimodal census capstone: ONE mixed corpus
    * (images + audio + video payloads, id-offset ranges) classified
    * by the container parsers ([[graft.functions.MediaDims]] +
    * [[graft.functions.Mp4Meta]] — recognition is mutually exclusive
    * by magic bytes, so evaluating both expressions per row is the
    * scan-shaped classifier) and rolled up per modality: count,
    * byte mass, and the modality's FIRST-FILTER drop rate (images:
    * sub-64px thumbnails; audio: sub-16 kHz; video: sub-3 s clips) —
    * the one-page answer to "what is in my multimodal corpus and how
    * much survives the cheap filters". Pure integer unpack
    * arithmetic over one scan; payloads never shuffle. The oracle
    * re-parses each sub-corpus with the proven recursive walks and
    * classifies BY SOURCE RANGE — a different derivation of the same
    * truth (expression ≡ walk, already established per parser).
    */
  def mediaMix(s: SparkSession, d: String): DataFrame = {
    val mix = Tables.mediaHeaders(s, d)
      .unionAll(Tables.mediaAudio(s, d)
        .select((col("media_id") + 10000000L).as("media_id"), col("payload")))
      .unionAll(Tables.mediaVideo(s, d)
        .select((col("media_id") + 20000000L).as("media_id"), col("payload")))
    mix
      .select(col("media_id"), length(col("payload")).cast("long").as("bytes"),
        MediaDims.dims(col("payload")).as("v1"),
        graft.functions.Mp4Meta.mvhd(col("payload")).as("v2"))
      .withColumn("fmt",
        when(expr("shiftright(v1, 48)") === MediaDims.FmtPng, "png")
          .when(expr("shiftright(v1, 48)") === MediaDims.FmtJpeg, "jpeg")
          .when(expr("shiftright(v1, 48)") === MediaDims.FmtGif, "gif")
          .when(expr("shiftright(v1, 48)") === MediaDims.FmtWav, "wav")
          .when(col("v2") =!= 0L, "mp4")
          .otherwise("other"))
      .withColumn("dropped",
        when(col("fmt") === "png" || col("fmt") === "jpeg" ||
          col("fmt") === "gif",
          expr("shiftright(v1, 24) % 16777216 < 64 OR v1 % 16777216 < 64"))
          .when(col("fmt") === "wav",
            expr("shiftright(v1, 24) % 16777216 < 16000"))
          .when(col("fmt") === "mp4",
            expr("shiftright(v2, 32) > 0 AND " +
              "((v2 % 4294967296) * 1000) div shiftright(v2, 32) < 3000"))
          .otherwise(lit(false)))
      .groupBy(col("fmt"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("bytes")).cast("long").as("bytes"),
        sum(col("dropped").cast("long")).cast("long").as("n_drop"))
      .withColumn("drop_micro", expr("(n_drop * 1000000) div n"))
      .orderBy(col("fmt"))
  }

  val mediaMixSql: String = {
    def beV(i: String) = s"('0x' || substr(x.s, 2*(g.p+$i)+1, 8))::BIGINT"
    def bA(i: String) = s"('0x' || substr(x.s, 2*(g.p+$i)+1, 2))::BIGINT"
    s"""WITH RECURSIVE ${Tables.mediaHeadersSql},
       |${Tables.mediaAudioSql},
       |${Tables.mediaVideoSql},
       |hxi AS (
       |  SELECT media_id, hex(payload) AS s,
       |         octet_length(payload)::BIGINT AS n
       |  FROM mediah
       |), seg(media_id, p, done_fmt, done_w, done_h) AS (
       |  SELECT media_id, 2::BIGINT, NULL::VARCHAR, NULL::BIGINT, NULL::BIGINT
       |  FROM hxi WHERE n >= 4 AND substr(s, 1, 4) = 'FFD8'
       |  UNION ALL
       |  SELECT media_id,
       |    CASE WHEN mk = 'FF' THEN p + 1 -- T.81 fill-byte padding
       |         WHEN mk IN ('C0', 'C1', 'C2') THEN -1
       |         ELSE p + 2 + ('0x' || substr(s, 2*p+5, 4))::BIGINT END,
       |    CASE WHEN mk IN ('C0', 'C1', 'C2') THEN 'jpeg' END,
       |    CASE WHEN mk IN ('C0', 'C1', 'C2')
       |         THEN ('0x' || substr(s, 2*p+15, 4))::BIGINT END,
       |    CASE WHEN mk IN ('C0', 'C1', 'C2')
       |         THEN ('0x' || substr(s, 2*p+11, 4))::BIGINT END
       |  FROM (
       |    SELECT g.media_id, g.p, x.s, substr(x.s, 2*g.p+3, 2) AS mk
       |    FROM seg g JOIN hxi x ON x.media_id = g.media_id
       |    WHERE g.p >= 0 AND g.done_fmt IS NULL AND g.p + 9 <= x.n
       |      AND substr(x.s, 2*g.p+1, 2) = 'FF'
       |  )
       |), imgp AS (
       |  SELECT media_id, 'png' AS fmt,
       |         ('0x' || substr(s, 33, 8))::BIGINT AS width,
       |         ('0x' || substr(s, 41, 8))::BIGINT AS height
       |  FROM hxi
       |  WHERE n >= 24 AND substr(s, 1, 16) = '89504E470D0A1A0A'
       |    AND substr(s, 25, 8) = '49484452'
       |  UNION ALL
       |  SELECT media_id, done_fmt, done_w, done_h
       |  FROM seg WHERE done_fmt IS NOT NULL
       |  UNION ALL
       |  SELECT media_id, 'gif',
       |         ('0x' || substr(s, 15, 2) || substr(s, 13, 2))::BIGINT,
       |         ('0x' || substr(s, 19, 2) || substr(s, 17, 2))::BIGINT
       |  FROM hxi
       |  WHERE n >= 10 AND substr(s, 1, 8) = '47494638'
       |    AND substr(s, 9, 4) IN ('3761', '3961')
       |), hxa AS (
       |  SELECT media_id, hex(payload) AS s,
       |         octet_length(payload)::BIGINT AS n
       |  FROM mediaa
       |), rw(media_id, p, rate, ch, bits) AS (
       |  SELECT media_id, 12::BIGINT, NULL::BIGINT, NULL::BIGINT, NULL::BIGINT
       |  FROM hxa
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
       |      ${bA("4")} + 256*${bA("5")} + 65536*${bA("6")}
       |        + 16777216*${bA("7")} AS sz,
       |      ${bA("12")} + 256*${bA("13")} + 65536*${bA("14")}
       |        + 16777216*${bA("15")} AS r,
       |      ${bA("10")} + 256*${bA("11")} AS c,
       |      ${bA("22")} + 256*${bA("23")} AS bb
       |    FROM rw g JOIN hxa x ON x.media_id = g.media_id
       |    WHERE g.p >= 0 AND g.rate IS NULL AND g.p + 8 <= x.n
       |  ) WHERE isfmt OR sz <= n
       |), wavp AS (
       |  SELECT media_id, rate FROM rw WHERE rate IS NOT NULL
       |), hxv AS (
       |  SELECT media_id, hex(payload) AS s,
       |         octet_length(payload)::BIGINT AS n
       |  FROM mediav
       |), wk(media_id, p, lim, inm, ts, dur) AS (
       |  SELECT media_id, 0::BIGINT, n, FALSE, NULL::BIGINT, NULL::BIGINT
       |  FROM hxv
       |  UNION ALL
       |  SELECT media_id,
       |    CASE WHEN ismoov THEN p + 8
       |         WHEN ismvhd OR sz < 8 THEN -1
       |         ELSE p + sz END,
       |    CASE WHEN ismoov THEN p + sz ELSE lim END,
       |    inm OR ismoov,
       |    CASE WHEN ismvhd THEN
       |      CASE WHEN ver = 0 AND p + 28 <= lim THEN ts0
       |           WHEN ver = 1 AND p + 40 <= lim THEN ts1 END END,
       |    CASE WHEN ismvhd THEN
       |      CASE WHEN ver = 0 AND p + 28 <= lim THEN du0
       |           WHEN ver = 1 AND p + 40 <= lim THEN du1 END END
       |  FROM (
       |    SELECT g.media_id, g.p, g.lim, g.inm, x.n,
       |      ${beV("0")} AS sz,
       |      (NOT g.inm AND substr(x.s, 2*g.p+9, 8) = '6D6F6F76'
       |        AND ${beV("0")} >= 8
       |        AND g.p + ${beV("0")} <= x.n) AS ismoov,
       |      (g.inm AND substr(x.s, 2*g.p+9, 8) = '6D766864'
       |        AND ${beV("0")} >= 8) AS ismvhd,
       |      CASE WHEN g.p + 9 <= g.lim
       |           THEN ('0x' || substr(x.s, 2*g.p+17, 2))::BIGINT END AS ver,
       |      CASE WHEN g.p + 28 <= g.lim THEN ${beV("20")} END AS ts0,
       |      CASE WHEN g.p + 28 <= g.lim THEN ${beV("24")} END AS du0,
       |      CASE WHEN g.p + 40 <= g.lim THEN ${beV("28")} END AS ts1,
       |      CASE WHEN g.p + 40 <= g.lim THEN ${beV("36")} END AS du1
       |    FROM wk g JOIN hxv x ON x.media_id = g.media_id
       |    WHERE g.p >= 0 AND g.ts IS NULL AND g.p + 8 <= g.lim
       |  )
       |), mp4p AS (
       |  SELECT media_id, ts, dur FROM wk
       |  WHERE ts IS NOT NULL AND NOT (ts = 0 AND dur = 0)
       |), mix AS (
       |  SELECT media_id, octet_length(payload)::BIGINT AS bytes, 0 AS k
       |  FROM mediah
       |  UNION ALL
       |  SELECT media_id + 10000000, octet_length(payload)::BIGINT, 1
       |  FROM mediaa
       |  UNION ALL
       |  SELECT media_id + 20000000, octet_length(payload)::BIGINT, 2
       |  FROM mediav
       |), class AS (
       |  SELECT m.media_id, m.bytes,
       |    CASE WHEN m.k = 0 THEN coalesce(i.fmt, 'other')
       |         WHEN m.k = 1 THEN
       |           CASE WHEN w.rate IS NOT NULL THEN 'wav' ELSE 'other' END
       |         ELSE CASE WHEN v.ts IS NOT NULL THEN 'mp4' ELSE 'other' END
       |         END AS fmt,
       |    CASE WHEN m.k = 0 AND i.fmt IS NOT NULL
       |           THEN (i.width < 64 OR i.height < 64)
       |         WHEN m.k = 1 AND w.rate IS NOT NULL THEN w.rate < 16000
       |         WHEN m.k = 2 AND v.ts IS NOT NULL
       |           THEN v.ts > 0 AND (v.dur * 1000) // v.ts < 3000
       |         ELSE FALSE END AS dropped
       |  FROM mix m
       |  LEFT JOIN imgp i ON m.k = 0 AND i.media_id = m.media_id
       |  LEFT JOIN wavp w ON m.k = 1 AND w.media_id = m.media_id - 10000000
       |  LEFT JOIN mp4p v ON m.k = 2 AND v.media_id = m.media_id - 20000000
       |)
       |SELECT fmt, count(*)::BIGINT AS n, sum(bytes)::BIGINT AS bytes,
       |       sum(CASE WHEN dropped THEN 1 ELSE 0 END)::BIGINT AS n_drop,
       |       (sum(CASE WHEN dropped THEN 1 ELSE 0 END)::BIGINT * 1000000)
       |         // count(*) AS drop_micro
       |FROM class
       |GROUP BY fmt
       |ORDER BY fmt""".stripMargin
  }

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
       |    CASE WHEN mk = 'FF' THEN p + 1 -- T.81 fill-byte padding
       |         WHEN mk IN ('C0', 'C1', 'C2') THEN -1
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
       |), gif AS (
       |  SELECT media_id, 'gif' AS fmt,
       |         ('0x' || substr(s, 15, 2) || substr(s, 13, 2))::BIGINT AS width,
       |         ('0x' || substr(s, 19, 2) || substr(s, 17, 2))::BIGINT AS height
       |  FROM hx
       |  WHERE n >= 10 AND substr(s, 1, 8) = '47494638'
       |    AND substr(s, 9, 4) IN ('3761', '3961')
       |), parsed AS (SELECT * FROM png UNION ALL SELECT * FROM jpeg
       |              UNION ALL SELECT * FROM gif)
       |SELECT m.media_id, p.fmt, p.width, p.height,
       |       CASE WHEN p.fmt IS NOT NULL
       |            THEN p.width < 64 OR p.height < 64 END AS small
       |FROM hx m LEFT JOIN parsed p ON p.media_id = m.media_id
       |ORDER BY m.media_id""".stripMargin
}
