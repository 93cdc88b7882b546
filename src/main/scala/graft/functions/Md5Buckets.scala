package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native md5-bucket arrays — the fused form of the house
  * `conv(substring(md5(g), 1, 7), 16, 10) % mod` hash-bucket chain
  * (bit-identical: the 28-bit value is read straight off the digest
  * bytes, exactly [[SigExprs]]' h1 arithmetic / the oracle's
  * `('0x' || substr(md5(g), 1, 7))::BIGINT % mod`).
  *
  * The composable chain evaluates interpreted per element under a HOF
  * (md5 → 32-char hex string → substring → conv string parse → cast →
  * pmod, with per-call allocations for each step) — measured 2-3× of
  * the total q_cdc_* / q_dsir runtime. This expression is one native
  * loop with a reused MessageDigest; `pair = true` hashes adjacent
  * element pairs (`t[i] + " " + t[i+1]`, the word-bigram form) without
  * materializing the bigram strings at all.
  */
object Md5Kit {
  private val tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private def top28(d: Array[Byte]): Long =
    ((d(0) & 0xFFL) << 20) | ((d(1) & 0xFFL) << 12) |
      ((d(2) & 0xFFL) << 4) | ((d(3) & 0xFFL) >> 4)

  /** Driver-side twin of the per-row bucket — SAME digest arithmetic,
    * so a store partitioned by the expression's bucket can be pruned
    * by buckets computed on the driver (the partition-contract a
    * term-bucketed postings store needs).
    */
  def bucketOfString(s: String, mod: Long): Long = {
    val md = tl.get()
    md.reset()
    top28(md.digest(s.getBytes("UTF-8"))) % mod
  }

  /** Shared by interpreted eval AND generated code. */
  def buckets(arr: ArrayData, salt: Array[Byte], mod: Long,
    pair: Boolean): ArrayData = {
    val md = tl.get()
    val n = arr.numElements()
    val m = if (pair) math.max(n - 1, 0) else n
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.reset()
      if (salt.nonEmpty) md.update(salt)
      if (pair) {
        md.update(arr.getUTF8String(i).getBytes)
        md.update(' '.toByte)
        md.update(arr.getUTF8String(i + 1).getBytes)
      } else {
        md.update(arr.getUTF8String(i).getBytes)
      }
      out(i) = top28(md.digest()) % mod
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 28 bits read from hex chars [7r+1, 7r+7] of the digest — the
    * window the oracle mirrors as
    * `('0x' || substr(md5(g), 7r+1, 7))::BIGINT`. r in [0, 4): four
    * disjoint windows per 32-hex digest.
    */
  private def window28(d: Array[Byte], r: Int): Long = {
    val o = 7 * r // first nibble index
    var v = 0L
    var t = 0
    while (t < 7) {
      val j = o + t
      val nib = if ((j & 1) == 0) (d(j >> 1) & 0xF0) >> 4 else d(j >> 1) & 0x0F
      v = (v << 4) | nib
      t += 1
    }
    v
  }

  /** `depth` buckets per element off ONE digest pass, flat row-major:
    * out[i·depth + r] = window28(md5(salt + elem_i), r) % mod. The
    * multi-row sketch hash ([[Cms]]) at one md5 per element instead of
    * depth.
    */
  def multiBuckets(arr: ArrayData, salt: Array[Byte], mod: Long,
    depth: Int): ArrayData = {
    val md = tl.get()
    val n = arr.numElements()
    val out = new Array[Long](n * depth)
    var i = 0
    while (i < n) {
      md.reset()
      if (salt.nonEmpty) md.update(salt)
      md.update(arr.getUTF8String(i).getBytes)
      val d = md.digest()
      var r = 0
      while (r < depth) {
        out(i * depth + r) = window28(d, r) % mod
        r += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Driver-side twin of [[multiBuckets]] for one string. */
  def multiBucketOfString(s: String, mod: Long, depth: Int): Array[Long] = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    Array.tabulate(depth)(r => window28(d, r) % mod)
  }
}

/** `array<string> -> array<long>` of md5 buckets; `pair = true` emits
  * n-1 adjacent-pair (bigram) buckets.
  */
case class Md5BucketsExpr(child: Expression, salt: String, mod: Long,
  pair: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val saltBytes = salt.getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any =
    Md5Kit.buckets(input.asInstanceOf[ArrayData], saltBytes, mod, pair)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("bucketSalt", saltBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5Kit.buckets($a, $sRef, ${mod}L, $pair);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5BucketsExpr =
    copy(child = newChild)
}

/** `array<string> -> array<long>` flat row-major multi-window buckets
  * — `depth` sketch rows per element from one digest.
  */
case class Md5MultiBucketsExpr(child: Expression, salt: String, mod: Long,
  depth: Int) extends UnaryExpression {

  require(depth >= 1 && depth <= 4, "four 28-bit windows per digest")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val saltBytes = salt.getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any =
    Md5Kit.multiBuckets(input.asInstanceOf[ArrayData], saltBytes, mod, depth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("bucketSalt", saltBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5Kit.multiBuckets($a, $sRef, ${mod}L, $depth);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5MultiBucketsExpr =
    copy(child = newChild)
}

object Md5Buckets {
  /** Per-element buckets of `salt + elem`. */
  def salted(arr: Column, salt: String, mod: Long): Column =
    toColumn(Md5BucketsExpr(toExpression(arr), salt, mod, pair = false))

  /** Adjacent-pair (word-bigram) buckets — n-1 entries. */
  def pairGrams(arr: Column, mod: Long): Column =
    toColumn(Md5BucketsExpr(toExpression(arr), "", mod, pair = true))

  /** `depth` buckets per element, flat row-major, one digest/element. */
  def multi(arr: Column, mod: Long, depth: Int): Column =
    toColumn(Md5MultiBucketsExpr(toExpression(arr), "", mod, depth))
}
