package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Dense per-row rotation `out[j] = Σ_i m[j][i]·x[i]` for an
  * `array<float>` embedding — the apply side of [[graft.operators.OPQ]]
  * rotations. The matrix rides along as a task reference object (the
  * [[HyperplaneBitsExpr]] contract); generated code is two tight
  * loops, d² multiply-adds per row, no allocation beyond the output —
  * a per-row map that fuses into the surrounding projection, so
  * rotating a corpus costs one narrow pass and zero shuffle.
  * Accumulation in double, output cast to float (the embedding
  * storage type).
  */
case class RotateVecExpr(child: Expression, m: Array[Array[Double]])
  extends UnaryExpression {

  // by-value over the rotation matrix — see [[ExprEq]]
  override def equals(o: Any): Boolean = ExprEq.productEquals(this, o)
  override def hashCode(): Int = ExprEq.productHash(this)

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = m.length
    val out = new Array[Float](d)
    var j = 0
    while (j < d) {
      val row = m(j)
      val n = math.min(arr.numElements(), row.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += arr.getFloat(i).toDouble * row(i)
        i += 1
      }
      out(j) = s.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("rot", m, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      s"""
         |float[] $out = new float[$mRef.length];
         |for (int $j = 0; $j < $mRef.length; $j++) {
         |  double[] $row = $mRef[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $row.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * $row[$i];
         |  }
         |  $out[$j] = (float) $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RotateVecExpr =
    copy(child = newChild)
}

object RotateVec {
  def apply(emb: Column, m: Array[Array[Double]]): Column =
    toColumn(RotateVecExpr(toExpression(emb), m))
}
