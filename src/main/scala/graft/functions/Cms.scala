package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch over string grams — the COUNTING member of the
  * mergeable-artifact family ([[Bloom]] answers "seen at all?",
  * [[graft.operators.QualitySketch]] answers "where in the
  * distribution?", this answers "roughly how often?") in bounded
  * memory: depth × width longs regardless of corpus size.
  *
  * Guarantees (Cormode & Muthukrishnan 2005): estimates never
  * UNDERcount (every row's counter saw every occurrence), and
  * overcount by more than εN only with probability δ, ε = e/width,
  * δ ≈ e^-depth. Merging is elementwise addition — EXACT, any order —
  * so per-partition/per-batch sketches fold into a corpus sketch
  * without a second scan (the [[graft.operators.Relevance.bm25Stats]]
  * incremental contract).
  *
  * Hashing: the depth row buckets come from ONE md5 digest per gram —
  * four disjoint 28-bit windows ([[Md5Kit.multiBuckets]]), row r
  * mirrored by the oracle as
  * `('0x' || substr(md5(g), 7r+1, 7))::BIGINT % width` — so fit and
  * serve cost one native digest pass, and DuckDB can replay every
  * counter exactly.
  */
/** `array<string> -> array<long>` of count-min estimates against a
  * fitted sketch's counter tables.
  */
case class CmsEstimatesExpr(child: Expression, rows: Array[Array[Long]],
  width: Long) extends UnaryExpression {

  // by-value over the counter tables — see [[ExprEq]]
  override def equals(o: Any): Boolean = ExprEq.productEquals(this, o)
  override def hashCode(): Int = ExprEq.productHash(this)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Cms.estimatesKernel(input.asInstanceOf[ArrayData], rows, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("cmsRows", rows, "long[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Cms.estimatesKernel($a, $rRef, ${width}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimatesExpr =
    copy(child = newChild)
}

object Cms {

  /** Default geometry: ε ≈ e/512 ≈ 0.5% of mass, δ ≈ e^-4 ≈ 2%. */
  val Depth = 4
  val Width = 512L

  final case class Sketch(depth: Int, width: Long,
    rows: Array[Array[Long]], total: Long) {

    /** Point estimate — min over rows, never below the true count. */
    def estimate(g: String): Long = {
      val bs = Md5Kit.multiBucketOfString(g, width, depth)
      var m = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = rows(r)(bs(r).toInt)
        if (c < m) m = c
        r += 1
      }
      m
    }

    /** Elementwise-add merge — exact, commutative, associative. */
    def merge(o: Sketch): Sketch = {
      require(depth == o.depth && width == o.width, "geometry mismatch")
      Sketch(depth, width,
        rows.zip(o.rows).map { case (a, b) =>
          a.zip(b).map { case (x, y) => x + y } },
        total + o.total)
    }
  }

  /** Fit from a gram frame (one string per row in `gramCol`): one
    * digest pass, one partial-agg groupBy folding to ≤ depth × width
    * counter rows (collected under the bounded-statistic contract).
    */
  def fit(grams: DataFrame, gramCol: String,
    depth: Int = Depth, width: Long = Width): Sketch = {
    val rowsDf = grams
      .select(posexplode(
        Md5Buckets.multi(array(col(gramCol)), width, depth))
        .as(Seq("r", "b")))
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).cast("long").as("c"))
    val counters = Array.fill(depth)(new Array[Long](width.toInt))
    rowsDf.collect().foreach { row =>
      counters(row.getInt(0))(row.getLong(1).toInt) = row.getLong(2)
    }
    Sketch(depth, width, counters, counters(0).sum)
  }

  /** Shared by interpreted eval AND generated code: one digest per
    * gram, min over the row counters.
    */
  def estimatesKernel(arr: ArrayData, rows: Array[Array[Long]],
    width: Long): ArrayData = {
    val depth = rows.length
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val bs = Md5Kit.multiBucketOfString(arr.getUTF8String(i).toString,
        width, depth)
      var m = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = rows(r)(bs(r).toInt)
        if (c < m) m = c
        r += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-gram estimates for an `array<string>` column — a native
    * kernel carrying the counter tables as a reference object (the
    * [[NearestCentroids]] pattern: the task-side equivalent of a
    * broadcast), one digest pass per gram, riding the scan: the serve
    * face costs ZERO shuffle however big the corpus that trained the
    * sketch. A lambda-HOF formulation here would re-inline the bucket
    * array per element (the q_cdc lesson) — the kernel is the fix.
    */
  def estimates(gramsArr: Column, s: Sketch): Column =
    toColumn(CmsEstimatesExpr(toExpression(gramsArr), s.rows, s.width))
}
