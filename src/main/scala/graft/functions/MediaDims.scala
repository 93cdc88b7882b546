package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Container-header dimension sniff over an opaque binary payload —
  * the FIRST filter of every real multimodal curation pass (drop
  * sub-64px thumbnails and byte-noise before paying for perceptual
  * hashing), upgrading `q_media_meta`'s magic-byte sniff (reference
  * analogue: the blind binary download in `download_with_retries`,
  * Notion_openai_vector_etl.py:219-235, which records bytes but
  * nothing about the picture) to real width/height without any
  * decoder:
  *
  *  - PNG: the 8-byte signature, then the IHDR chunk is MANDATED
  *    first (PNG spec 5.6), so width/height are fixed big-endian
  *    u32s at bytes 16–19 / 20–23 — a pure offset read.
  *  - JPEG: SOI (FF D8), then a marker-segment WALK — each segment
  *    is FF marker + u16 big-endian length (inclusive) — until a
  *    start-of-frame marker (SOF0 baseline / SOF1 extended / SOF2
  *    progressive: C0/C1/C2), whose payload carries height at bytes
  *    +5..6 and width at +7..8. The walk is required: APP/COM
  *    segments before SOF have data-dependent lengths, so no fixed
  *    offset exists.
  *
  * Result is ONE packed long (the [[DHash64]] determinism class —
  * pure integer byte arithmetic, interpreted ≡ codegen ≡ the DuckDB
  * hex-arithmetic oracle): `fmt << 48 | width << 24 | height`, fmt
  * 1 = PNG, 2 = JPEG, and 0 (whole value) = not a recognized
  * container. Consumers unpack with shifts ([[MediaDims.fmtOf]] and
  * friends). Truncated or corrupt headers — walk running off the
  * payload, marker byte missing, IHDR absent — yield 0, never a
  * throw: at 100 TB some payloads WILL be garbage and a scan-side
  * expression must be total.
  */
object MediaDims {
  val FmtPng = 1L
  val FmtJpeg = 2L

  /** WAV/RIFF — the audio rung: the packed layout reuses the low 48
    * bits as `sample_rate << 24 | channels << 8 | bits_per_sample`
    * (rate < 2^24 covers every real rate; the consumer knows the
    * layout from fmt). RIFF is LITTLE-endian chunk ids + u32le sizes
    * with odd-size padding — the walk is required just like JPEG's
    * (JUNK/LIST chunks of data-dependent length precede `fmt ` in
    * real files, and the fixture plants them).
    */
  val FmtWav = 3L

  /** GIF — the fourth container rung: "GIF87a"/"GIF89a" signature,
    * then the logical-screen width/height as LITTLE-endian u16 at
    * fixed bytes 6–9 (GIF89a spec §18) — no walk needed, but the
    * endianness is opposite PNG/JPEG's, which is exactly the byte
    * order bug the fixture's asymmetric dims catch.
    */
  val FmtGif = 4L

  def dims(payload: Column): Column = toColumn(MediaDimsExpr(toExpression(payload)))
}

case class MediaDimsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"media_dims needs BINARY input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length
    var v = 0L
    if (n >= 24 && (b(0) & 0xFF) == 0x89 && b(1) == 0x50 && b(2) == 0x4E &&
      b(3) == 0x47 && (b(4) & 0xFF) == 0x0D && (b(5) & 0xFF) == 0x0A &&
      (b(6) & 0xFF) == 0x1A && (b(7) & 0xFF) == 0x0A) {
      if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val w = ((b(16) & 0xFFL) << 24) | ((b(17) & 0xFFL) << 16) |
          ((b(18) & 0xFFL) << 8) | (b(19) & 0xFFL)
        val h = ((b(20) & 0xFFL) << 24) | ((b(21) & 0xFFL) << 16) |
          ((b(22) & 0xFFL) << 8) | (b(23) & 0xFFL)
        v = (MediaDims.FmtPng << 48) | ((w & 0xFFFFFFL) << 24) | (h & 0xFFFFFFL)
      }
    } else if (n >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var p = 2
      var done = false
      while (!done && p + 9 <= n && (b(p) & 0xFF) == 0xFF) {
        val mk = b(p + 1) & 0xFF
        if (mk == 0xFF) {
          p += 1 // ITU T.81 B.1.1.2: 0xFF fill bytes may pad markers
        } else if (mk == 0xC0 || mk == 0xC1 || mk == 0xC2) {
          val h = ((b(p + 5) & 0xFFL) << 8) | (b(p + 6) & 0xFFL)
          val w = ((b(p + 7) & 0xFFL) << 8) | (b(p + 8) & 0xFFL)
          v = (MediaDims.FmtJpeg << 48) | (w << 24) | h
          done = true
        } else {
          p += 2 + (((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF))
        }
      }
    } else if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = (b(6) & 0xFFL) | ((b(7) & 0xFFL) << 8)
      val h = (b(8) & 0xFFL) | ((b(9) & 0xFFL) << 8)
      v = (MediaDims.FmtGif << 48) | (w << 24) | h
    } else if (n >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E') {
      var p = 12
      var done = false
      while (!done && p + 8 <= n) {
        val sz = (b(p + 4) & 0xFFL) | ((b(p + 5) & 0xFFL) << 8) |
          ((b(p + 6) & 0xFFL) << 16) | ((b(p + 7) & 0xFFL) << 24)
        if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' &&
          b(p + 3) == ' ' && p + 24 <= n) {
          val ch = (b(p + 10) & 0xFFL) | ((b(p + 11) & 0xFFL) << 8)
          val rate = (b(p + 12) & 0xFFL) | ((b(p + 13) & 0xFFL) << 8) |
            ((b(p + 14) & 0xFFL) << 16) | ((b(p + 15) & 0xFFL) << 24)
          val bits = (b(p + 22) & 0xFFL) | ((b(p + 23) & 0xFFL) << 8)
          v = (MediaDims.FmtWav << 48) | ((rate & 0xFFFFFFL) << 24) |
            ((ch & 0xFFL) << 8) | (bits & 0xFFL)
          done = true
        } else if (sz > n) done = true // corrupt size: walk off, stay 0
        else p += (8L + sz + (sz & 1L)).toInt
      }
    }
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val p = ctx.freshName("p")
      val mk = ctx.freshName("mk")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val sz = ctx.freshName("sz")
      s"""
         |int $n = $a.length;
         |long $v = 0L;
         |if ($n >= 24 && ($a[0] & 0xFF) == 0x89 && $a[1] == 0x50 &&
         |    $a[2] == 0x4E && $a[3] == 0x47 && ($a[4] & 0xFF) == 0x0D &&
         |    ($a[5] & 0xFF) == 0x0A && ($a[6] & 0xFF) == 0x1A &&
         |    ($a[7] & 0xFF) == 0x0A) {
         |  if ($a[12] == 'I' && $a[13] == 'H' && $a[14] == 'D' && $a[15] == 'R') {
         |    long $w = (($a[16] & 0xFFL) << 24) | (($a[17] & 0xFFL) << 16) |
         |      (($a[18] & 0xFFL) << 8) | ($a[19] & 0xFFL);
         |    long $h = (($a[20] & 0xFFL) << 24) | (($a[21] & 0xFFL) << 16) |
         |      (($a[22] & 0xFFL) << 8) | ($a[23] & 0xFFL);
         |    $v = (${MediaDims.FmtPng}L << 48) | (($w & 0xFFFFFFL) << 24) |
         |      ($h & 0xFFFFFFL);
         |  }
         |} else if ($n >= 4 && ($a[0] & 0xFF) == 0xFF && ($a[1] & 0xFF) == 0xD8) {
         |  int $p = 2;
         |  while ($p + 9 <= $n && ($a[$p] & 0xFF) == 0xFF) {
         |    int $mk = $a[$p + 1] & 0xFF;
         |    if ($mk == 0xFF) { $p += 1; continue; } // T.81 fill byte
         |    if ($mk == 0xC0 || $mk == 0xC1 || $mk == 0xC2) {
         |      long $h = (($a[$p + 5] & 0xFFL) << 8) | ($a[$p + 6] & 0xFFL);
         |      long $w = (($a[$p + 7] & 0xFFL) << 8) | ($a[$p + 8] & 0xFFL);
         |      $v = (${MediaDims.FmtJpeg}L << 48) | ($w << 24) | $h;
         |      break;
         |    }
         |    $p += 2 + ((($a[$p + 2] & 0xFF) << 8) | ($a[$p + 3] & 0xFF));
         |  }
         |} else if ($n >= 10 && $a[0] == 'G' && $a[1] == 'I' && $a[2] == 'F' &&
         |    $a[3] == '8' && ($a[4] == '7' || $a[4] == '9') && $a[5] == 'a') {
         |  long $w = ($a[6] & 0xFFL) | (($a[7] & 0xFFL) << 8);
         |  long $h = ($a[8] & 0xFFL) | (($a[9] & 0xFFL) << 8);
         |  $v = (${MediaDims.FmtGif}L << 48) | ($w << 24) | $h;
         |} else if ($n >= 12 && $a[0] == 'R' && $a[1] == 'I' && $a[2] == 'F' &&
         |    $a[3] == 'F' && $a[8] == 'W' && $a[9] == 'A' && $a[10] == 'V' &&
         |    $a[11] == 'E') {
         |  int $p = 12;
         |  while ($p + 8 <= $n) {
         |    long $sz = ($a[$p + 4] & 0xFFL) | (($a[$p + 5] & 0xFFL) << 8) |
         |      (($a[$p + 6] & 0xFFL) << 16) | (($a[$p + 7] & 0xFFL) << 24);
         |    if ($a[$p] == 'f' && $a[$p + 1] == 'm' && $a[$p + 2] == 't' &&
         |        $a[$p + 3] == ' ' && $p + 24 <= $n) {
         |      long $w = ($a[$p + 12] & 0xFFL) | (($a[$p + 13] & 0xFFL) << 8) |
         |        (($a[$p + 14] & 0xFFL) << 16) | (($a[$p + 15] & 0xFFL) << 24);
         |      long $h = (((($a[$p + 10] & 0xFFL) | (($a[$p + 11] & 0xFFL) << 8))
         |          & 0xFFL) << 8) |
         |        ((($a[$p + 22] & 0xFFL) | (($a[$p + 23] & 0xFFL) << 8)) & 0xFFL);
         |      $v = (${MediaDims.FmtWav}L << 48) | (($w & 0xFFFFFFL) << 24) | $h;
         |      break;
         |    } else if ($sz > $n) { break; }
         |    $p += (int) (8L + $sz + ($sz & 1L));
         |  }
         |}
         |${ev.value} = $v;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MediaDimsExpr =
    copy(child = newChild)
}
