package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Native per-row argmax over a small centroid set: returns the `n`
  * nearest centroids of an `array<float>` embedding as
  * `array<struct<cent_id: long, c_sim: double>>`, ordered by rounded
  * cosine desc, cent_id asc.
  *
  * Why an Expression and not a join: every candidate (vector, centroid)
  * pair is generated from that vector alone, so nearest-centroid
  * assignment is a per-row reduction — the crossJoin(broadcast(cents))
  * + Window.partitionBy(vec_id) + row_number formulation it replaces
  * shuffled and sorted |V|×nlist rows to compute what needs ZERO
  * shuffle. The centroid matrix rides along as a reference object
  * (the [[HyperplaneBitsExpr]] pattern — the task-side equivalent of a
  * broadcast), and the generated code is two tight primitive loops.
  *
  * Arithmetic parity with the DuckDB oracle (and with the join+window
  * form): dot products fold left-to-right in double over float inputs
  * (the [[VecDot]] order), the row norm is sqrt(dot(v,v)), cosine is
  * rounded via floor(x*1e6+0.5)/1e6 ([[TextSim.r6]]) BEFORE ranking,
  * ties break on lowest cent_id.
  */
case class NearestCentroidsExpr(child: Expression, centIds: Array[Long],
  centVecs: Array[Array[Float]], centNrms: Array[Double], n: Int)
  extends UnaryExpression {

  require(n > 0 && centIds.length == centVecs.length &&
    centIds.length == centNrms.length)

  // by-value over the centroid tables — see [[ExprEq]]
  override def equals(o: Any): Boolean = ExprEq.productEquals(this, o)
  override def hashCode(): Int = ExprEq.productHash(this)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("c_sim", DoubleType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var sn = 0.0
    var i = 0
    while (i < len) { val f = arr.getFloat(i).toDouble; sn += f * f; i += 1 }
    val nrm = math.sqrt(sn)
    val topId = new Array[Long](n)
    val topSim = new Array[Double](n)
    var filled = 0
    var c = 0
    while (c < centIds.length) {
      val row = centVecs(c)
      val nn = math.min(len, row.length)
      var s = 0.0
      var j = 0
      while (j < nn) { s += arr.getFloat(j).toDouble * row(j).toDouble; j += 1 }
      val sim = math.floor(s / (nrm * centNrms(c)) * 1e6 + 0.5) / 1e6
      var pos = filled
      while (pos > 0 && (sim > topSim(pos - 1) ||
        (sim == topSim(pos - 1) && centIds(c) < topId(pos - 1)))) pos -= 1
      if (pos < n) {
        var k = math.min(filled, n - 1)
        while (k > pos) { topSim(k) = topSim(k - 1); topId(k) = topId(k - 1); k -= 1 }
        topSim(pos) = sim
        topId(pos) = centIds(c)
        if (filled < n) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var k = 0
    while (k < filled) {
      out(k) = new GenericInternalRow(Array[Any](topId(k), topSim(k)))
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", centIds, "long[]")
    val vecsRef = ctx.addReferenceObj("centVecs", centVecs, "float[][]")
    val nrmsRef = ctx.addReferenceObj("centNrms", centNrms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val sn = ctx.freshName("sn")
      val nrm = ctx.freshName("nrm")
      val topId = ctx.freshName("topId")
      val topSim = ctx.freshName("topSim")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val rowv = ctx.freshName("rowv")
      val s = ctx.freshName("s")
      val sim = ctx.freshName("sim")
      val pos = ctx.freshName("pos")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      s"""
         |int $len = $a.numElements();
         |double $sn = 0.0;
         |for (int $i = 0; $i < $len; $i++) {
         |  double f = (double) $a.getFloat($i); $sn += f * f;
         |}
         |double $nrm = java.lang.Math.sqrt($sn);
         |long[] $topId = new long[$n];
         |double[] $topSim = new double[$n];
         |int $filled = 0;
         |for (int $c = 0; $c < $idsRef.length; $c++) {
         |  float[] $rowv = $vecsRef[$c];
         |  int nn = java.lang.Math.min($len, $rowv.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < nn; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $rowv[$i];
         |  }
         |  double $sim = java.lang.Math.floor($s / ($nrm * $nrmsRef[$c]) * 1.0E6 + 0.5) / 1.0E6;
         |  int $pos = $filled;
         |  while ($pos > 0 && ($sim > $topSim[$pos - 1] ||
         |      ($sim == $topSim[$pos - 1] && $idsRef[$c] < $topId[$pos - 1]))) $pos--;
         |  if ($pos < $n) {
         |    for (int $k = java.lang.Math.min($filled, $n - 1); $k > $pos; $k--) {
         |      $topSim[$k] = $topSim[$k - 1]; $topId[$k] = $topId[$k - 1];
         |    }
         |    $topSim[$pos] = $sim;
         |    $topId[$pos] = $idsRef[$c];
         |    if ($filled < $n) $filled++;
         |  }
         |}
         |Object[] $out = new Object[$filled];
         |for (int $k = 0; $k < $filled; $k++) {
         |  $out[$k] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $topId[$k], $topSim[$k] });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsExpr =
    copy(child = newChild)
}

object NearestCentroids {
  def apply(emb: Column, centIds: Array[Long], centVecs: Array[Array[Float]],
    centNrms: Array[Double], n: Int): Column =
    toColumn(NearestCentroidsExpr(toExpression(emb), centIds, centVecs, centNrms, n))

  /** Build the expression from a `(cent_id, c_emb, c_nrm)` centroid
    * frame. The collect ships exactly the rows a broadcast join would
    * ship (nlist centroids — small by IVF's premise); sorting by
    * cent_id keeps the tie-break scan order deterministic.
    */
  def fromFrame(emb: Column, cents: DataFrame, n: Int): Column = {
    val rows = cents.select("cent_id", "c_emb", "c_nrm").collect()
      .sortBy(_.getLong(0))
    NearestCentroids(emb,
      rows.map(_.getLong(0)),
      rows.map(_.getSeq[Float](1).toArray),
      rows.map(_.getDouble(2)), n)
  }
}
