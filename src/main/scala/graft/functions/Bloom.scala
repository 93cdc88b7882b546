package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Bloom-filter membership screening — the 100 TB shape for
  * "does this doc share n-grams with the held-out eval set".
  *
  * [[graft.operators.Corpus.contamination]] (the exact screen) joins
  * corpus shingles against eval shingles: one shuffle of the CORPUS
  * n-gram stream per screen, and the eval side re-broadcast as rows.
  * At 100 TB the right probe is membership against a bit array: the
  * eval set compresses to m bits (16 KB–16 MB for any real benchmark
  * suite), ships once, and the corpus is screened by a per-row map
  * riding the scan — no shuffle, no join, nothing keyed on the corpus.
  * The price is a bounded false-positive rate (never false negatives),
  * which is the correct trade for a screen whose hits get an exact
  * verify anyway (the LSH-then-verify pattern every dedup operator
  * here already uses).
  *
  * Hashing is Kirsch–Mitzenmacher double hashing (position_j =
  * h1 + j·h2 mod m) off one FNV-1a pass — computed by the SAME static
  * helpers on the build (Aggregator) and probe (codegen) sides, so a
  * gram inserted is a gram found, by construction.
  */
object Bloom {

  /** FNV-1a 64 over UTF-8 bytes; h2 derives via the splitmix64
    * finalizer (odd-forced so the double-hash stride cycles all of a
    * power-of-two m).
    */
  def h1(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def h2(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) | 1L
  }

  private def setBits(bits: Array[Long], g: String, k: Int): Unit = {
    val m = bits.length.toLong * 64L
    val a = h1(g.getBytes("UTF-8"))
    val b = h2(a)
    var j = 0
    while (j < k) {
      val pos = java.lang.Math.floorMod(a + j * b, m)
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      j += 1
    }
  }

  private def testBits(bits: Array[Long], a: Long, k: Int): Boolean = {
    val m = bits.length.toLong * 64L
    val b = h2(a)
    var j = 0
    while (j < k) {
      val pos = java.lang.Math.floorMod(a + j * b, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      j += 1
    }
    true
  }

  /** Static probe entry shared by interpreted eval AND generated code:
    * number of grams in `arr` whose k positions are all set.
    */
  def countHits(arr: ArrayData, bits: Array[Long], k: Int): Int = {
    var hits = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) &&
        testBits(bits, h1(arr.getUTF8String(i).getBytes), k)) hits += 1
      i += 1
    }
    hits
  }

  /** A fitted filter: `mBits` total bits as packed longs, k probes. */
  case class Filter(bits: Array[Long], k: Int) {
    def mightContain(g: String): Boolean =
      testBits(bits, h1(g.getBytes("UTF-8")), k)
    def sizeBytes: Int = bits.length * 8
  }

  private class BitAgg(mWords: Int, k: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](mWords)
    override def reduce(b: Array[Long], g: String): Array[Long] = {
      setBits(b, g, k); b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Build a filter over a string column: one map-side-combined
    * aggregation — each partition fills a local m-bit buffer, buffers
    * OR-merge (m/8 bytes per partition through the 1-group exchange,
    * independent of row count). `mBits` rounds UP TO A POWER OF TWO
    * (min 64): h2's odd stride is coprime to m only when m = 2^t, so
    * any other size would let the k probes collapse onto a subcycle
    * (gcd(h2, m) > 1) and quietly raise the false-positive rate —
    * false negatives stay impossible either way, but the FP bound is
    * part of this filter's contract. The rounding costs < 2× bits and
    * LOWERS the FP rate vs the requested size.
    */
  def fit(grams: DataFrame, gramCol: String, mBits: Int, k: Int = 5): Filter = {
    require(mBits >= 1 && mBits <= (1 << 30),
      s"mBits must be in [1, 2^30], got $mBits")
    val m =
      if (mBits <= 64) 64
      else Integer.highestOneBit(mBits - 1) << 1
    val mWords = m / 64
    val agg = new BitAgg(mWords, k)
    import grams.sparkSession.implicits._
    val bits = grams.select(col(gramCol)).as[String]
      .select(agg.toColumn).head()
    Filter(bits, k)
  }

  /** Per-row probe: how many of the row's grams the filter contains.
    * The bit array rides as a codegen reference object (use a real
    * `Broadcast` handle at GB-scale filters, as [[RoutedNearest]]
    * does); the generated code is one static call — the scan stays in
    * whole-stage codegen with zero joins.
    */
  def hits(grams: Column, f: Filter): Column =
    toColumn(BloomHitsExpr(toExpression(grams), f.bits, f.k))
}

/** `array<string> -> int`: count of grams present in the filter.
  *
  * equals/hashCode are BY-VALUE over the bit array: the case-class
  * defaults compare `bits` by reference, so two probes against equal
  * filters would never be `semanticEquals` — defeating common-
  * subexpression elimination and plan canonicalization for repeated
  * probes of the same filter.
  */
case class BloomHitsExpr(child: Expression, bits: Array[Long], k: Int)
  extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def equals(other: Any): Boolean = ExprEq.productEquals(this, other)
  override def hashCode(): Int = ExprEq.productHash(this)

  override def nullSafeEval(input: Any): Any =
    Bloom.countHits(input.asInstanceOf[ArrayData], bits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Bloom.countHits($a, $bRef, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHitsExpr =
    copy(child = newChild)
}
