package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native random-hyperplane sign bits for LSH: bit p = 1 iff
  * Σ_i embedding[i]·coefs[p][i] ≥ 0, summed in input order (double,
  * left-to-right — bit-identical to the unrolled ± element sum and to
  * the DuckDB oracle's list_sum comprehension).
  *
  * The unrolled-expression form this replaces built a
  * planes×dim-term tree (3072 nodes at 48×64) that janino recompiled
  * on every plan; here the coefficient matrix rides along as a
  * reference object and the generated code is two tight loops.
  */
case class HyperplaneBitsExpr(child: Expression, coefs: Array[Array[Double]])
  extends UnaryExpression {

  // by-value over the coefficient matrix — see [[ExprEq]]
  override def equals(o: Any): Boolean = ExprEq.productEquals(this, o)
  override def hashCode(): Int = ExprEq.productHash(this)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val planes = coefs.length
    val out = new Array[Long](planes)
    var p = 0
    while (p < planes) {
      val row = coefs(p)
      val n = math.min(arr.numElements(), row.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += arr.getFloat(i).toDouble * row(i)
        i += 1
      }
      out(p) = if (s >= 0) 1L else 0L
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coefs", coefs, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      s"""
         |long[] $out = new long[$cRef.length];
         |for (int $p = 0; $p < $cRef.length; $p++) {
         |  double[] $row = $cRef[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $row.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * $row[$i];
         |  }
         |  $out[$p] = $s >= 0 ? 1L : 0L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBitsExpr =
    copy(child = newChild)
}

object HyperplaneBits {
  def apply(emb: Column, coefs: Array[Array[Double]]): Column =
    toColumn(HyperplaneBitsExpr(toExpression(emb), coefs))
}
