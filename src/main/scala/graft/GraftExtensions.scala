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
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinhashSigExpr].getName, null,
        "minhash_sig",
        "minhash_sig(pairs) - 64-element MinHash signature from an " +
          "array<struct<h1: long, h2: long>> hash-pair column " +
          "(build pairs with graft.functions.TextSim.hashPairs)",
        "hash functions"),
      (children: Seq[Expression]) => graft.functions.MinhashSigExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dhash64"),
      new ExpressionInfo(classOf[graft.functions.DHash64Expr].getName, null,
        "dhash64",
        "dhash64(payload) - 64-bit perceptual difference-hash of a " +
          "binary payload (fixed-grid resample, 65 pooled cells, " +
          "adjacent-gradient bits)",
        "hash functions"),
      (children: Seq[Expression]) => graft.functions.DHash64Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("media_dims"),
      new ExpressionInfo(classOf[graft.functions.MediaDimsExpr].getName, null,
        "media_dims",
        "media_dims(payload) - packed container dims of a binary " +
          "payload: fmt << 48 | width << 24 | height (fmt 1=PNG from " +
          "IHDR, 2=JPEG from the SOF marker walk; 0 = unrecognized)",
        "hash functions"),
      (children: Seq[Expression]) => graft.functions.MediaDimsExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash48"),
      new ExpressionInfo(classOf[graft.functions.Simhash48Expr].getName, null,
        "simhash48",
        "simhash48(pairs) - 48-bit SimHash from an " +
          "array<struct<h1: long, h2: long>> hash-pair column",
        "hash functions"),
      (children: Seq[Expression]) => graft.functions.Simhash48Expr(children.head)))
  }
}
