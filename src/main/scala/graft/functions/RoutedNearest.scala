package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** The leaf-centroid matrix of a two-level (routed) coarse quantizer,
  * grouped by top cell: `ids(g)/vecs(g)/nrms(g)` are the leaf ids,
  * embeddings, and norms of top cell `g+1` (top ids are 1-based).
  * Plain `val`s so generated Java reaches fields as `ids()[g]`.
  */
final class RoutedCents(val ids: Array[Array[Long]],
  val vecs: Array[Array[Array[Float]]], val nrms: Array[Array[Double]])
  extends Serializable

/** Per-row argmax over ONLY the leaf centroids of the row's routed top
  * cells: `groups` is the (tiny) array of top-cell ids the row routed
  * to, and the result is the `n` nearest leaves among those cells'
  * leaves, as `array<struct<cent_id, c_sim>>` — the
  * [[NearestCentroidsExpr]] contract restricted to a leaf subset.
  *
  * Scale shape, and why this differs from [[NearestCentroidsExpr]]:
  * the flat expression ships its centroid matrix as a plan reference
  * object — serialized with EVERY task — which is the right trade for
  * nlist ≤ a few thousand and the wrong one past it. Here the full
  * leaf matrix (kTop·kSub rows — the point of routing is that this no
  * longer fits the per-task budget) rides a REAL `Broadcast`: tasks
  * carry only the handle, each executor pulls the matrix once from its
  * block manager, and per-row compute is kTop + n·kSub dot products
  * instead of nlist. Arithmetic is bit-identical to the flat
  * expression (double fold in dim order, r6-rounded cosine BEFORE
  * ranking, ties break on lowest cent_id), so probe selection over the
  * union of all groups equals the flat top-n — asserted in
  * RoutedIndexSpec.
  */
case class RoutedNearestExpr(left: Expression, right: Expression,
  bc: Broadcast[RoutedCents], n: Int) extends BinaryExpression {

  require(n > 0)

  // groups array first (left), embedding second (right)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("c_sim", DoubleType, nullable = false))),
    containsNull = false)

  @transient private lazy val rc: RoutedCents = bc.value

  override def nullSafeEval(groupsAny: Any, embAny: Any): Any = {
    val groups = groupsAny.asInstanceOf[ArrayData]
    val arr = embAny.asInstanceOf[ArrayData]
    val len = arr.numElements()
    var sn = 0.0
    var i = 0
    while (i < len) { val f = arr.getFloat(i).toDouble; sn += f * f; i += 1 }
    val nrm = math.sqrt(sn)
    val topId = new Array[Long](n)
    val topSim = new Array[Double](n)
    var filled = 0
    var gi = 0
    while (gi < groups.numElements()) {
      val g = groups.getLong(gi).toInt - 1
      if (g >= 0 && g < rc.ids.length) {
        val ids = rc.ids(g); val vecs = rc.vecs(g); val nrms = rc.nrms(g)
        var c = 0
        while (c < ids.length) {
          val row = vecs(c)
          val nn = math.min(len, row.length)
          var s = 0.0
          var j = 0
          while (j < nn) { s += arr.getFloat(j).toDouble * row(j).toDouble; j += 1 }
          val sim = math.floor(s / (nrm * nrms(c)) * 1e6 + 0.5) / 1e6
          var pos = filled
          while (pos > 0 && (sim > topSim(pos - 1) ||
            (sim == topSim(pos - 1) && ids(c) < topId(pos - 1)))) pos -= 1
          if (pos < n) {
            var k = math.min(filled, n - 1)
            while (k > pos) { topSim(k) = topSim(k - 1); topId(k) = topId(k - 1); k -= 1 }
            topSim(pos) = sim
            topId(pos) = ids(c)
            if (filled < n) filled += 1
          }
          c += 1
        }
      }
      gi += 1
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
    val bcRef = ctx.addReferenceObj("routedBc", bc,
      classOf[Broadcast[RoutedCents]].getName)
    // one block-manager pull per task, not per row
    val rcVar = ctx.addMutableState("graft.functions.RoutedCents", "routedCents",
      v => s"$v = (graft.functions.RoutedCents) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (grps, a) => {
      val len = ctx.freshName("len")
      val sn = ctx.freshName("sn")
      val nrm = ctx.freshName("nrm")
      val topId = ctx.freshName("topId")
      val topSim = ctx.freshName("topSim")
      val filled = ctx.freshName("filled")
      val gi = ctx.freshName("gi")
      val g = ctx.freshName("g")
      val ids = ctx.freshName("ids")
      val vecs = ctx.freshName("vecs")
      val nrms = ctx.freshName("nrms")
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
         |for (int $gi = 0; $gi < $grps.numElements(); $gi++) {
         |  int $g = (int) $grps.getLong($gi) - 1;
         |  if ($g < 0 || $g >= $rcVar.ids().length) continue;
         |  long[] $ids = $rcVar.ids()[$g];
         |  float[][] $vecs = $rcVar.vecs()[$g];
         |  double[] $nrms = $rcVar.nrms()[$g];
         |  for (int $c = 0; $c < $ids.length; $c++) {
         |    float[] $rowv = $vecs[$c];
         |    int nn = java.lang.Math.min($len, $rowv.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < nn; $i++) {
         |      $s += (double) $a.getFloat($i) * (double) $rowv[$i];
         |    }
         |    double $sim = java.lang.Math.floor($s / ($nrm * $nrms[$c]) * 1.0E6 + 0.5) / 1.0E6;
         |    int $pos = $filled;
         |    while ($pos > 0 && ($sim > $topSim[$pos - 1] ||
         |        ($sim == $topSim[$pos - 1] && $ids[$c] < $topId[$pos - 1]))) $pos--;
         |    if ($pos < $n) {
         |      for (int $k = java.lang.Math.min($filled, $n - 1); $k > $pos; $k--) {
         |        $topSim[$k] = $topSim[$k - 1]; $topId[$k] = $topId[$k - 1];
         |      }
         |      $topSim[$pos] = $sim;
         |      $topId[$pos] = $ids[$c];
         |      if ($filled < $n) $filled++;
         |    }
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

  override protected def withNewChildrenInternal(newLeft: Expression,
    newRight: Expression): RoutedNearestExpr =
    copy(left = newLeft, right = newRight)
}

object RoutedNearest {
  def apply(groups: Column, emb: Column, bc: Broadcast[RoutedCents],
    n: Int): Column =
    toColumn(RoutedNearestExpr(toExpression(groups), toExpression(emb), bc, n))

  /** Group a `(cent_id, c_emb, c_nrm)` LEAF centroid frame by its top
    * cell (leaf cent_id = (top_id−1)·kSub + sub, 1-based both levels)
    * and broadcast the grouped matrix. The collect ships each leaf
    * once to the driver — the same rows a broadcast join would ship —
    * and the return handle is what tasks carry.
    */
  def broadcastFrom(leaves: DataFrame, kTop: Int, kSub: Int):
      Broadcast[RoutedCents] =
    broadcastFromRows(leaves.sparkSession.sparkContext,
      leaves.select("cent_id", "c_emb", "c_nrm").collect(), kTop, kSub)

  /** Same, from already-collected `(cent_id, c_emb, c_nrm)` rows — the
    * [[graft.sources.IndexStore]] serving Handle holds them from its
    * one open-time metadata read.
    */
  def broadcastFromRows(sc: org.apache.spark.SparkContext,
    collected: Array[org.apache.spark.sql.Row], kTop: Int, kSub: Int):
      Broadcast[RoutedCents] = {
    val rows = collected.sortBy(_.getLong(0))
    val none = Array.empty[org.apache.spark.sql.Row]
    val byTop = rows.groupBy(r => ((r.getLong(0) - 1) / kSub).toInt)
    val ids = Array.tabulate(kTop)(g =>
      byTop.getOrElse(g, none).map(_.getLong(0)))
    val vecs = Array.tabulate(kTop)(g =>
      byTop.getOrElse(g, none).map(_.getSeq[Float](1).toArray))
    val nrms = Array.tabulate(kTop)(g =>
      byTop.getOrElse(g, none).map(_.getDouble(2)))
    sc.broadcast(new RoutedCents(ids, vecs, nrms))
  }
}
