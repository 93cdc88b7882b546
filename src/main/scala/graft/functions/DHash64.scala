package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual difference-hash over an opaque binary payload — the
  * image-grain sibling of [[SigExprs.simhash48]] (reference analogue:
  * the byte-exact digest in `hash_file`, Notion_openai_vector_etl.py:
  * 102-107, which a re-encoded or resized payload ESCAPES; this hash
  * is the near-dup detector that doesn't).
  *
  * Model: the payload is a 1-D luminance strip (the engine's media
  * stubs are deliberately 1-D, [[graft.sources.MediaTransforms]]).
  * dHash pipeline, faithfully miniaturized:
  *   1. resample to a FIXED grid of [[DHash64.Samples]] points by
  *      nearest neighbor — sample m reads byte `(m·n)/S` (integer
  *      floor). Fixed-grid resampling is what makes the hash a
  *      PERCEPTUAL one: an exactly k×-upsampled payload (every byte
  *      repeated k times) yields bit-identical samples
  *      (`⌊⌊m·kn/S⌋/k⌋ = ⌊m·n/S⌋`), so "resized" copies hash equal.
  *   2. box-filter to [[DHash64.Cells]] cells of
  *      [[DHash64.CellSamples]] samples each (average pooling — a
  *      small per-byte perturbation like a brightness shift moves a
  *      cell sum by at most 8·ε, far under typical adjacent-cell
  *      contrast).
  *   3. 64 gradient bits: bit k = cell-sum(k+1) > cell-sum(k)
  *      (equal-count cells, so sums compare directly — no division
  *      anywhere; bit 63 wraps into the sign bit, matching the
  *      oracle's explicit Long.MinValue term).
  *
  * Pure integer arithmetic end to end — bit-identical to the DuckDB
  * mirror in [[graft.operators.MediaDedup.mediaNearDupSql]]. Empty
  * payloads hash to 0.
  */
object DHash64 {
  /** Fixed resample grid: 65 cells × 8 samples. */
  val Cells = 65
  val CellSamples = 8
  val Samples: Int = Cells * CellSamples

  def dhash64(payload: Column): Column =
    toColumn(DHash64Expr(toExpression(payload)))
}

case class DHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dhash64 needs BINARY input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length.toLong
    if (n == 0L) 0L
    else {
      val sums = new Array[Long](DHash64.Cells)
      var m = 0
      while (m < DHash64.Samples) {
        sums(m / DHash64.CellSamples) +=
          (bytes(((m * n) / DHash64.Samples).toInt) & 0xFFL)
        m += 1
      }
      var acc = 0L
      var k = 0
      while (k < DHash64.Cells - 1) {
        if (sums(k + 1) > sums(k)) acc |= 1L << k
        k += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sums = ctx.freshName("sums")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      s"""
         |long $n = (long) $a.length;
         |long $acc = 0L;
         |if ($n > 0L) {
         |  long[] $sums = new long[${DHash64.Cells}];
         |  for (int $m = 0; $m < ${DHash64.Samples}; $m++) {
         |    $sums[$m / ${DHash64.CellSamples}] +=
         |      ($a[(int) (($m * $n) / ${DHash64.Samples}L)] & 0xFFL);
         |  }
         |  for (int $k = 0; $k < ${DHash64.Cells - 1}; $k++) {
         |    if ($sums[$k + 1] > $sums[$k]) $acc |= 1L << $k;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DHash64Expr =
    copy(child = newChild)
}
