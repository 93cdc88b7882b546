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

object Md5Buckets {
  /** Per-element buckets of `salt + elem`. */
  def salted(arr: Column, salt: String, mod: Long): Column =
    toColumn(Md5BucketsExpr(toExpression(arr), salt, mod, pair = false))

  /** Adjacent-pair (word-bigram) buckets — n-1 entries. */
  def pairGrams(arr: Column, mod: Long): Column =
    toColumn(Md5BucketsExpr(toExpression(arr), "", mod, pair = true))
}
