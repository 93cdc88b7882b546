package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native FastCDC-style clamped cut scan — the [[Md5Buckets]] lesson
  * applied to [[graft.operators.Cdc.boundedChunks]]: the clamp is an
  * inherently sequential accept/reject walk over the cut candidates,
  * and the `aggregate`-HOF form pays a struct allocation per WORD and
  * an array copy per accepted cut (O(cuts²) per doc) — measured 3.9 s
  * vs 1.1 s for the unclamped chunker at sf0.1. This expression is
  * the same walk as one tight loop over the bucket array: zero
  * allocation until the output, O(n) per doc.
  *
  * Input: the per-word md5 bucket array (bucket of word i at index
  * i−1). Output: accepted 1-based cut positions — position `i` ends a
  * chunk; a cut at the last word starts no chunk, so `i < n` always.
  * Accept rule: (bucket == 0 ∧ gap ≥ minWords) ∨ gap ≥ maxWords,
  * where gap counts words since the previous accepted cut.
  */
object BoundedCutsKit {

  /** Shared by interpreted eval AND generated code. */
  def cuts(buckets: ArrayData, minWords: Int, maxWords: Int): ArrayData = {
    val n = buckets.numElements()
    // ≤ (n-1)/minWords accepted cuts, but forced cuts cap the bound
    // at (n-1)/min(minWords, maxWords) = (n-1)/minWords since
    // minWords <= maxWords; size exactly later via trim
    val out = new Array[Int](if (n == 0) 0 else (n - 1) / minWords + 1)
    var m = 0
    var last = 0
    var i = 1
    while (i < n) {
      val gap = i - last
      if ((buckets.getLong(i - 1) == 0L && gap >= minWords) ||
        gap >= maxWords) {
        out(m) = i
        m += 1
        last = i
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

/** `array<long> -> array<int>`: accepted clamped cut positions. */
case class BoundedCutsExpr(child: Expression, minWords: Int, maxWords: Int)
  extends UnaryExpression {

  require(minWords >= 1 && minWords <= maxWords,
    s"need 1 <= minWords <= maxWords, got [$minWords, $maxWords]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BoundedCutsKit.cuts(input.asInstanceOf[ArrayData], minWords, maxWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BoundedCutsKit.cuts($a, $minWords, $maxWords);")

  override protected def withNewChildInternal(newChild: Expression): BoundedCutsExpr =
    copy(child = newChild)
}

object BoundedCuts {
  def of(buckets: Column, minWords: Int, maxWords: Int): Column =
    toColumn(BoundedCutsExpr(toExpression(buckets), minWords, maxWords))
}
