package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made `ExpressionUtils` private[sql]; libraries providing
  * first-class `Expression`s (the codegen'd [[graft.functions.VecDot]])
  * still need the conversion, so this one-file shim lives in the sql
  * package — the established pattern for Spark extension libraries.
  * Nothing else of Spark's internals is touched.
  */
object graftshim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
