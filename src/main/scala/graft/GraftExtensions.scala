package graft

import graft.functions.VecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: makes graft's native expressions
  * available to pure-SQL users.
  *
  * Activate with `.withExtensions(new GraftExtensions)` on the builder
  * or `spark.sql.extensions=graft.GraftExtensions` in config — the
  * standard plug-in path, no Spark fork needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, null, "vec_dot",
        "vec_dot(a, b) - double-precision dot product of two float vectors",
        "array functions"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))
  }
}
