package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel. The ASCII fast path matters: at
  * corpus scale the overwhelming majority of rows are pure ASCII,
  * which NFC cannot change — those skip the String materialization
  * and the Normalizer call entirely (one byte scan, zero alloc).
  */
object NfcKit {
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      val out = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      if (out eq str) s else UTF8String.fromString(out)
    }
  }
}

/** `string -> string` Unicode NFC normalization as a native codegen'd
  * Expression (preference ladder (b): a HOF can't express this and a
  * UDF would break whole-stage codegen for the scan projection it
  * rides). Oracle twin: DuckDB's `nfc_normalize`.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcKit.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcKit.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column API: NFC-normalize a string column. */
  def nfc(c: Column): Column = toColumn(NfcNormalizeExpr(toExpression(c)))
}
