package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer et al. SIGMOD'03), the
  * fused form of the house chain
  * `array_distinct(transform(windows, i -> array_min(slice(h, i, w))))`
  * over `h = transform(grams, g -> conv(substring(md5(g),1,7),16,10))`
  * — bit-identical output set (top-28-bit md5 per char k-gram, min per
  * w-gram window, first-occurrence-distinct), one pass.
  *
  * Why native: the composed chain is interpreted per k-gram (md5 → hex
  * string → substring → conv parse → cast, with allocations at every
  * step), the `substr(text, i, k)` under the position transform
  * re-scans the UTF8String from byte 0 per gram (the [[GramHash]]
  * quadratic-substring lesson), and the winnow slice lambda forces a
  * persist barrier on the gram array to dodge project-collapse
  * re-derivation. This loop walks the byte array once, reuses one
  * MessageDigest ([[Md5Kit]]'s thread-local), keeps the sliding min
  * with a monotonic deque (O(n), not O(n·w)), and dedups in place —
  * no barrier, no HOFs, no per-gram allocation beyond the digest.
  *
  * Byte windows, not char windows — identical on ASCII (this corpus;
  * parity with the composed chain is spec-asserted on the real
  * fixture), the [[GramHash]] byte-gram contract.
  */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k > 0 && w > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowKit.fps(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WinnowKit.fps($s, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

object WinnowKit {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private def top28(d: Array[Byte]): Long =
    ((d(0) & 0xFFL) << 20) | ((d(1) & 0xFFL) << 12) |
      ((d(2) & 0xFFL) << 4) | ((d(3) & 0xFFL) >> 4)

  /** Distinct winnowed fingerprints of `s`: min of each `w`-window of
    * the `numBytes-k+1` k-gram md5 hashes, first-occurrence order.
    * Empty when fewer than `w` grams fit (mirrors the composed chain's
    * length filter producing an empty window sequence).
    */
  def fps(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = s.getBytes // copies only when not array-backed at 0
    val nGrams = bytes.length - k + 1
    val nWin = nGrams - w + 1
    if (nWin <= 0) return new GenericArrayData(Array.empty[Long])
    val md = tl.get()
    val h = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, i, k)
      h(i) = top28(md.digest())
      i += 1
    }
    // monotonic-deque sliding min + in-place first-occurrence dedup
    val deque = new Array[Int](nGrams) // indices, increasing h values
    var head = 0; var tail = 0 // [head, tail)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nWin)
    var m = 0
    i = 0
    while (i < nGrams) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val v = h(deque(head))
        if (seen.add(v)) { out(m) = v; m += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

object WinnowFps {
  /** Distinct winnowed fingerprint array of a text column. */
  def apply(text: Column, k: Int, w: Int): Column =
    toColumn(WinnowFpsExpr(toExpression(text), k, w))
}
