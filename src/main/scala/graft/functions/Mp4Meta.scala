package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** MP4 / ISO-BMFF movie-header sniff over an opaque binary payload —
  * the VIDEO rung of the container-metadata family ([[MediaDims]]
  * covers PNG/JPEG/WAV; reference analogue: the blind binary download
  * in `download_with_retries`, Notion_openai_vector_etl.py:219-235).
  * Duration is the first filter of every video curation pass (drop
  * sub-3-second clips before paying for frame sampling), and the
  * mvhd timescale/duration pair is pure integer byte arithmetic —
  * no decoder, no codec, just the box walk the ISO 14496-12 layout
  * mandates:
  *
  *  - top level is a chain of boxes `[u32be size][4cc type]`; `ftyp`
  *    (brand) usually first, `free`/`skip` boxes of data-dependent
  *    length are legal anywhere, so a WALK is required to find
  *    `moov` (same argument as the JPEG marker walk);
  *  - `moov` is a pure container; its child chain holds `mvhd`
  *    (movie header) whose FullBox version decides the layout:
  *    v0 → timescale u32 at +20, duration u32 at +24 (from box
  *    start); v1 → 64-bit create/modify times push timescale to
  *    +28 and duration (u64) to +32.
  *
  * Result is ONE packed long: `timescale << 32 | duration_low32`
  * (timescale masked to 31 bits — real timescales are ≤ 1e6; v1
  * durations keep their low 32 bits, ~49 days at timescale 1000 —
  * both caps documented, neither reachable by sane files). 0 = not
  * a recognized MP4 (no moov/mvhd chain). Truncated/corrupt sizes
  * (size < 8, walk past the payload, 64-bit `largesize` boxes) stop
  * the walk and yield 0, never a throw — the scan-side totality rule.
  * Same determinism class as [[DHash64]]/[[MediaDims]]: interpreted
  * ≡ codegen ≡ the DuckDB hex-arithmetic oracle.
  */
object Mp4Meta {
  def mvhd(payload: Column): Column = toColumn(Mp4MvhdExpr(toExpression(payload)))
}

case class Mp4MvhdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mp4_mvhd needs BINARY input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length.toLong
    var v = 0L
    var p = 0L
    var moovEnd = -1L
    while (v == 0L && p + 8 <= (if (moovEnd >= 0) moovEnd else n)) {
      val sz = ((b(p.toInt) & 0xFFL) << 24) | ((b(p.toInt + 1) & 0xFFL) << 16) |
        ((b(p.toInt + 2) & 0xFFL) << 8) | (b(p.toInt + 3) & 0xFFL)
      val t0 = b(p.toInt + 4); val t1 = b(p.toInt + 5)
      val t2 = b(p.toInt + 6); val t3 = b(p.toInt + 7)
      if (moovEnd < 0 && t0 == 'm' && t1 == 'o' && t2 == 'o' && t3 == 'v' &&
        sz >= 8 && p + sz <= n) {
        moovEnd = p + sz // descend: children start right after the header
        p += 8
      } else if (moovEnd >= 0 && t0 == 'm' && t1 == 'v' && t2 == 'h' &&
        t3 == 'd' && sz >= 8) {
        val q = p.toInt
        // version byte needs p+9 in bounds: a truncated mvhd must not throw
        val ver = if (p + 9 <= moovEnd) b(q + 8) & 0xFF else -1
        if (ver == 0 && p + 28 <= moovEnd) {
          val ts = ((b(q + 20) & 0xFFL) << 24) | ((b(q + 21) & 0xFFL) << 16) |
            ((b(q + 22) & 0xFFL) << 8) | (b(q + 23) & 0xFFL)
          val du = ((b(q + 24) & 0xFFL) << 24) | ((b(q + 25) & 0xFFL) << 16) |
            ((b(q + 26) & 0xFFL) << 8) | (b(q + 27) & 0xFFL)
          v = ((ts & 0x7FFFFFFFL) << 32) | du
        } else if (ver == 1 && p + 40 <= moovEnd) {
          val ts = ((b(q + 28) & 0xFFL) << 24) | ((b(q + 29) & 0xFFL) << 16) |
            ((b(q + 30) & 0xFFL) << 8) | (b(q + 31) & 0xFFL)
          val du = ((b(q + 36) & 0xFFL) << 24) | ((b(q + 37) & 0xFFL) << 16) |
            ((b(q + 38) & 0xFFL) << 8) | (b(q + 39) & 0xFFL)
          v = ((ts & 0x7FFFFFFFL) << 32) | du
        }
        p = n // stop either way: a corrupt mvhd never retries
      } else if (sz < 8) {
        p = n // size 0 (to-EOF) and 1 (largesize) stop the walk: total
      } else {
        p += sz
      }
    }
    v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val p = ctx.freshName("p")
      val me = ctx.freshName("moovEnd")
      val sz = ctx.freshName("sz")
      val q = ctx.freshName("q")
      val ver = ctx.freshName("ver")
      val ts = ctx.freshName("ts")
      val du = ctx.freshName("du")
      s"""
         |long $n = (long) $a.length;
         |long $v = 0L;
         |long $p = 0L;
         |long $me = -1L;
         |while ($v == 0L && $p + 8 <= ($me >= 0 ? $me : $n)) {
         |  int $q = (int) $p;
         |  long $sz = (($a[$q] & 0xFFL) << 24) | (($a[$q + 1] & 0xFFL) << 16) |
         |    (($a[$q + 2] & 0xFFL) << 8) | ($a[$q + 3] & 0xFFL);
         |  if ($me < 0 && $a[$q + 4] == 'm' && $a[$q + 5] == 'o' &&
         |      $a[$q + 6] == 'o' && $a[$q + 7] == 'v' && $sz >= 8 &&
         |      $p + $sz <= $n) {
         |    $me = $p + $sz;
         |    $p += 8;
         |  } else if ($me >= 0 && $a[$q + 4] == 'm' && $a[$q + 5] == 'v' &&
         |      $a[$q + 6] == 'h' && $a[$q + 7] == 'd' && $sz >= 8) {
         |    int $ver = ($p + 9 <= $me) ? ($a[$q + 8] & 0xFF) : -1;
         |    if ($ver == 0 && $p + 28 <= $me) {
         |      long $ts = (($a[$q + 20] & 0xFFL) << 24) | (($a[$q + 21] & 0xFFL) << 16) |
         |        (($a[$q + 22] & 0xFFL) << 8) | ($a[$q + 23] & 0xFFL);
         |      long $du = (($a[$q + 24] & 0xFFL) << 24) | (($a[$q + 25] & 0xFFL) << 16) |
         |        (($a[$q + 26] & 0xFFL) << 8) | ($a[$q + 27] & 0xFFL);
         |      $v = (($ts & 0x7FFFFFFFL) << 32) | $du;
         |    } else if ($ver == 1 && $p + 40 <= $me) {
         |      long $ts = (($a[$q + 28] & 0xFFL) << 24) | (($a[$q + 29] & 0xFFL) << 16) |
         |        (($a[$q + 30] & 0xFFL) << 8) | ($a[$q + 31] & 0xFFL);
         |      long $du = (($a[$q + 36] & 0xFFL) << 24) | (($a[$q + 37] & 0xFFL) << 16) |
         |        (($a[$q + 38] & 0xFFL) << 8) | ($a[$q + 39] & 0xFFL);
         |      $v = (($ts & 0x7FFFFFFFL) << 32) | $du;
         |    }
         |    $p = $n;
         |  } else if ($sz < 8) {
         |    $p = $n;
         |  } else {
         |    $p += $sz;
         |  }
         |}
         |${ev.value} = $v;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Mp4MvhdExpr =
    copy(child = newChild)
}
