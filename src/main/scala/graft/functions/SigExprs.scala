package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd signature kernels over a precomputed
  * `array<struct<h1:long,h2:long>>` hash-pair column.
  *
  * Semantics are bit-identical to the HOF forms in [[TextSim]]
  * (`minhashSigFromPairs` / `simhash48FromPairs`) and to the DuckDB
  * oracle's list comprehensions — pure 64-bit integer arithmetic with
  * the same iteration structure. They exist because the K×N lambda
  * loops (64 minhashes / 48 simhash bits × elements, per row) are the
  * measured hot path of the dedup queries and HOF lambdas evaluate
  * interpreted; these generate tight primitive loops instead.
  *
  * Inputs are non-empty by construction (callers filter `size >= 1`);
  * empty arrays yield an empty signature/0 rather than the HOF's
  * null-element array.
  */
object SigExprs {

  def minhashSig(pairs: Column): Column =
    toColumn(MinhashSigExpr(toExpression(pairs)))

  def simhash48(pairs: Column): Column =
    toColumn(Simhash48Expr(toExpression(pairs)))

  def hashPairs(arr: Column): Column =
    toColumn(HashPairsExpr(toExpression(arr)))
}

/** Native (h1, h2) hash pairs of an `array<string>` — the fused form
  * of [[TextSim.hashPairs]]: one md5 over the UTF-8 bytes per element,
  * with the two 28-bit ints read straight off the digest bytes instead
  * of materializing the 32-char hex string and parsing substrings
  * through `conv` (bit-identical values: h1 = hex digits 1-7,
  * h2 = hex digits 8-14, exactly the oracle's
  * `('0x' || substr(md5(s), 1, 7))::BIGINT` arithmetic).
  */
case class HashPairsExpr(child: Expression) extends UnaryExpression {

  import org.apache.spark.sql.types.{LongType => LT, StructField, StructType}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LT, nullable = false),
    StructField("h2", LT, nullable = false))), containsNull = false)

  private def pairOf(digest: Array[Byte]): (Long, Long) = {
    val h1 = ((digest(0) & 0xFFL) << 20) | ((digest(1) & 0xFFL) << 12) |
      ((digest(2) & 0xFFL) << 4) | ((digest(3) & 0xFFL) >> 4)
    val h2 = ((digest(3) & 0x0FL) << 24) | ((digest(4) & 0xFFL) << 16) |
      ((digest(5) & 0xFFL) << 8) | (digest(6) & 0xFFL)
    (h1, h2)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // interpreted path only (codegen has a reusable digest instance)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      md.reset()
      val (h1, h2) = pairOf(md.digest(arr.getUTF8String(i).getBytes))
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](h1, h2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""
        |try { $v = java.security.MessageDigest.getInstance("MD5"); }
        |catch (java.security.NoSuchAlgorithmException e) {
        |  throw new RuntimeException(e);
        |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val dg = ctx.freshName("dg")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $md.reset();
         |  byte[] $dg = $md.digest($a.getUTF8String($i).getBytes());
         |  long $h1 = (($dg[0] & 0xFFL) << 20) | (($dg[1] & 0xFFL) << 12) |
         |    (($dg[2] & 0xFFL) << 4) | (($dg[3] & 0xFFL) >> 4);
         |  long $h2 = (($dg[3] & 0x0FL) << 24) | (($dg[4] & 0xFFL) << 16) |
         |    (($dg[5] & 0xFFL) << 8) | ($dg[6] & 0xFFL);
         |  $out[$i] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $h1, $h2 });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashPairsExpr =
    copy(child = newChild)
}

case class MinhashSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](TextSim.MinhashK)
    var k = 0
    while (k < TextSim.MinhashK) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val row = arr.getStruct(i, 2)
        val g = (row.getLong(0) + k * row.getLong(1)) % TextSim.P
        if (g < m) m = g
        i += 1
      }
      out(k) = m
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      val g = ctx.freshName("g")
      val m = ctx.freshName("m")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[${TextSim.MinhashK}];
         |for (int $k = 0; $k < ${TextSim.MinhashK}; $k++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    InternalRow $row = $a.getStruct($i, 2);
         |    long $g = ($row.getLong(0) + (long) $k * $row.getLong(1)) % ${TextSim.P}L;
         |    if ($g < $m) $m = $g;
         |  }
         |  $out[$k] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

case class Simhash48Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var k = 0
    while (k < TextSim.SimhashBits) {
      var bitSum = 0L
      var i = 0
      while (i < n) {
        val row = arr.getStruct(i, 2)
        bitSum += ((row.getLong(0) + k * row.getLong(1)) % TextSim.P & 1L) * 2 - 1
        i += 1
      }
      if (bitSum > 0) acc += 1L << k
      k += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      val bitSum = ctx.freshName("bitSum")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $k = 0; $k < ${TextSim.SimhashBits}; $k++) {
         |  long $bitSum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    InternalRow $row = $a.getStruct($i, 2);
         |    $bitSum += (($row.getLong(0) + (long) $k * $row.getLong(1)) % ${TextSim.P}L & 1L) * 2 - 1;
         |  }
         |  if ($bitSum > 0) $acc += 1L << $k;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash48Expr =
    copy(child = newChild)
}
