package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Symmetric distance computation for PQ codes (Jégou et al.,
  * TPAMI'11 SDC): the dot product of two RECONSTRUCTIONS read directly
  * from their codes — `Σ_j tbl[j][a_j-1][b_j-1]` where `tbl[j]` holds
  * all k×k subspace-codebook dot products, precomputed once driver-side
  * and shipped as a task reference object (m·k² doubles — 16 KB at
  * m=8, k=16; the [[HyperplaneBitsExpr]] contract, chosen over a
  * typedLit table because 2 048 literal tree nodes would janino-
  * recompile per plan). This is what lets neighbor maintenance run
  * from STORED CODES alone — no original vectors, no decode join, m
  * array lookups per pair.
  */
case class SdcDotExpr(left: Expression, right: Expression,
  tbl: Array[Array[Array[Double]]]) extends BinaryExpression {

  // by-value over the SDC lookup tables — see [[ExprEq]]
  override def equals(o: Any): Boolean = ExprEq.productEquals(this, o)
  override def hashCode(): Int = ExprEq.productHash(this)

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ca = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val m = tbl.length
    var s = 0.0
    var j = 0
    while (j < m) {
      s += tbl(j)(ca.getLong(j).toInt - 1)(cb.getLong(j).toInt - 1)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("sdc", tbl, "double[][][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |double $s = 0.0;
         |for (int $j = 0; $j < $tRef.length; $j++) {
         |  $s += $tRef[$j][(int) $a.getLong($j) - 1][(int) $b.getLong($j) - 1];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
    newRight: Expression): SdcDotExpr = copy(left = newLeft, right = newRight)
}

object SdcDot {
  def apply(codesA: Column, codesB: Column,
    tbl: Array[Array[Array[Double]]]): Column =
    toColumn(SdcDotExpr(toExpression(codesA), toExpression(codesB), tbl))
}
