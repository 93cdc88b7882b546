package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Multi-probe bucket keys for random-hyperplane LSH (Lv et al.,
  * VLDB'07 multi-probe LSH applied to sign bits): for each band the
  * vector emits its HOME bucket plus `probes` perturbed buckets, each
  * flipping ONE of the band's least-confident bits — the planes whose
  * projection magnitude |Σ_i emb[i]·coefs[p][i]| is smallest, i.e. the
  * bits most likely to differ on a true near-duplicate sitting just
  * across a hyperplane. Ties break toward the lower plane index, so
  * the probe set is fully deterministic (and mirrorable in SQL).
  *
  * Output is one flat `array<long>` of `bands·(probes+1)` combined
  * keys `band·2^planesPerBand + bval`, home first within each band —
  * position `pos` belongs to band `pos / (probes+1)`, and
  * `pos % (probes+1) == 0` marks the home bucket. Flattening keeps the
  * whole computation one codegen'd pass (projections are computed once
  * and reused across the band loop, same contract as
  * [[HyperplaneBitsExpr]]).
  */
case class HyperplaneProbesExpr(child: Expression,
  coefs: Array[Array[Double]], planesPerBand: Int, probes: Int)
  extends UnaryExpression {

  require(probes >= 0 && probes <= planesPerBand,
    s"probes must be in [0, $planesPerBand], got $probes")
  require(coefs.length % planesPerBand == 0,
    s"${coefs.length} planes do not band evenly by $planesPerBand")

  // by-value over the coefficient matrix — see [[ExprEq]]
  override def equals(o: Any): Boolean = ExprEq.productEquals(this, o)
  override def hashCode(): Int = ExprEq.productHash(this)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val planes = coefs.length
    val bands = planes / planesPerBand
    val s = new Array[Double](planes)
    var p = 0
    while (p < planes) {
      val row = coefs(p)
      val n = math.min(arr.numElements(), row.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += arr.getFloat(i).toDouble * row(i)
        i += 1
      }
      s(p) = acc
      p += 1
    }
    val out = new Array[Long](bands * (probes + 1))
    var b = 0
    while (b < bands) {
      val base = b.toLong << planesPerBand
      var home = 0L
      var j = 0
      while (j < planesPerBand) {
        home = (home << 1) | (if (s(b * planesPerBand + j) >= 0) 1L else 0L)
        j += 1
      }
      out(b * (probes + 1)) = base + home
      val used = new Array[Boolean](planesPerBand)
      var t = 1
      while (t <= probes) {
        var best = -1
        var bm = Double.MaxValue
        var k = 0
        while (k < planesPerBand) {
          val m = math.abs(s(b * planesPerBand + k))
          if (!used(k) && m < bm) { bm = m; best = k }
          k += 1
        }
        // NaN projections (degenerate vector) compare false against
        // everything: no selectable bit -> re-emit the home key (a
        // harmless duplicate the candidate-join dedups) instead of
        // crashing the task
        if (best >= 0) {
          used(best) = true
          out(b * (probes + 1) + t) =
            base + (home ^ (1L << (planesPerBand - 1 - best)))
        } else out(b * (probes + 1) + t) = base + home
        t += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coefs", coefs, "double[][]")
    val ppb = planesPerBand
    val pr = probes
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      val b = ctx.freshName("b")
      val base = ctx.freshName("base")
      val home = ctx.freshName("home")
      val j = ctx.freshName("j")
      val used = ctx.freshName("used")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bm = ctx.freshName("bm")
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      s"""
         |double[] $s = new double[$cRef.length];
         |for (int $p = 0; $p < $cRef.length; $p++) {
         |  double[] $row = $cRef[$p];
         |  int $n = java.lang.Math.min($a.numElements(), $row.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * $row[$i];
         |  }
         |  $s[$p] = $acc;
         |}
         |long[] $out = new long[($cRef.length / $ppb) * ${pr + 1}];
         |for (int $b = 0; $b < $cRef.length / $ppb; $b++) {
         |  long $base = ((long) $b) << $ppb;
         |  long $home = 0L;
         |  for (int $j = 0; $j < $ppb; $j++) {
         |    $home = ($home << 1) | ($s[$b * $ppb + $j] >= 0 ? 1L : 0L);
         |  }
         |  $out[$b * ${pr + 1}] = $base + $home;
         |  boolean[] $used = new boolean[$ppb];
         |  for (int $t = 1; $t <= $pr; $t++) {
         |    int $best = -1;
         |    double $bm = Double.MAX_VALUE;
         |    for (int $k = 0; $k < $ppb; $k++) {
         |      double $m = java.lang.Math.abs($s[$b * $ppb + $k]);
         |      if (!$used[$k] && $m < $bm) { $bm = $m; $best = $k; }
         |    }
         |    if ($best >= 0) {
         |      $used[$best] = true;
         |      $out[$b * ${pr + 1} + $t] = $base + ($home ^ (1L << ($ppb - 1 - $best)));
         |    } else {
         |      $out[$b * ${pr + 1} + $t] = $base + $home;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneProbesExpr =
    copy(child = newChild)
}

object HyperplaneProbes {
  def apply(emb: Column, coefs: Array[Array[Double]], planesPerBand: Int,
    probes: Int): Column =
    toColumn(HyperplaneProbesExpr(toExpression(emb), coefs, planesPerBand, probes))
}
