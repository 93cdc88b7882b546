package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matching as a native codegen'd
  * Expression — the LARGE-dictionary scale path of term screening.
  * [[graft.operators.Blocklist]] carries its terms as a literal array
  * and pays one comparison per (token, term): fine at tens of terms,
  * dead at a 10⁵-entry gazetteer (PII name lists, URL fragments,
  * benchmark answer strings), where a regex alternation also explodes.
  * Aho–Corasick (1975) matches EVERY dictionary pattern in ONE pass
  * over the text — O(chars + matches), independent of dictionary size
  * — by walking a failure-linked pattern trie compiled to a dense DFA.
  *
  * The automaton is built ONCE driver-side from the pattern list and
  * rides to tasks as a codegen reference object (the
  * [[NearestCentroidsExpr]] centroid-matrix pattern — the task-side
  * equivalent of a broadcast; ~σ·states ints, e.g. ~60 KB for 10³
  * average-length patterns). Per row: one virtual call into compiled
  * JVM code, one transition per char, counts accumulated per pattern.
  * Matching is SUBSTRING semantics, all occurrences counted including
  * overlapping ones (the classic AC output function) — callers wanting
  * word-boundary semantics put the boundary in the pattern (" term ")
  * or tokenize first.
  *
  * Returns `array<long>` of per-pattern occurrence counts, aligned
  * with the constructor's pattern order.
  */
case class AhoCorasickCountsExpr(child: Expression, patterns: Array[String])
  extends UnaryExpression {

  require(patterns.nonEmpty && patterns.forall(_.nonEmpty))

  // by-value over the pattern table — see [[ExprEq]]
  override def equals(o: Any): Boolean = ExprEq.productEquals(this, o)
  override def hashCode(): Int = ExprEq.productHash(this)

  @transient private lazy val ac: AhoCorasick.Automaton =
    AhoCorasick.build(patterns)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ac.counts(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick.Automaton].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $acRef.counts($t.toString()));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): AhoCorasickCountsExpr =
    copy(child = newChild)
}

object AhoCorasick {

  def apply(text: Column, patterns: Seq[String]): Column =
    toColumn(AhoCorasickCountsExpr(toExpression(text), patterns.toArray))

  /** Failure-linked pattern trie compiled to a dense DFA over the
    * MAPPED alphabet (only chars that occur in some pattern get a
    * column; any other input char resets to the root — exactly the
    * goto-to-root the textbook automaton takes on a foreign symbol).
    * `emit(s)` is the FLATTENED output function: the pattern indexes
    * ending at s, own endings plus the whole fail chain's, precomputed
    * so the scan loop never walks fail links.
    */
  final class Automaton(
    val charMap: Array[Int],    // char (< 65536) -> alphabet index, -1 = foreign
    val sigma: Int,
    val delta: Array[Int],      // dense: state * sigma + a -> state
    val emit: Array[Array[Int]],// state -> pattern indexes ending here
    val nPatterns: Int) extends Serializable {

    /** Per-pattern occurrence counts over one text — all occurrences,
      * overlapping included.
      */
    def counts(text: String): Array[Long] = {
      val out = new Array[Long](nPatterns)
      var state = 0
      var i = 0
      val n = text.length
      while (i < n) {
        val c = text.charAt(i)
        val a = if (c < charMap.length) charMap(c) else -1
        state = if (a < 0) 0 else delta(state * sigma + a)
        val em = emit(state)
        var j = 0
        while (j < em.length) { out(em(j)) += 1L; j += 1 }
        i += 1
      }
      out
    }
  }

  /** Build trie + BFS failure links + dense goto closure. */
  def build(patterns: Array[String]): Automaton = {
    val alphabet = patterns.flatMap(_.toCharArray).distinct.sorted
    val maxChar = alphabet.last.toInt + 1
    val charMap = Array.fill(maxChar)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => charMap(c) = i }
    val sigma = alphabet.length
    // trie over mapped alphabet; grow by doubling
    var cap = 16
    var goto_ = Array.fill(cap * sigma)(-1)
    val endings = scala.collection.mutable.Map.empty[Int, List[Int]]
    var nStates = 1
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { c =>
        val a = charMap(c)
        if (goto_(s * sigma + a) < 0) {
          if (nStates == cap) {
            cap *= 2
            val g2 = Array.fill(cap * sigma)(-1)
            System.arraycopy(goto_, 0, g2, 0, nStates * sigma)
            goto_ = g2
          }
          goto_(s * sigma + a) = nStates
          nStates += 1
        }
        s = goto_(s * sigma + a)
      }
      endings(s) = pid :: endings.getOrElse(s, Nil)
    }
    // BFS failure links; close goto into a DFA in the same pass
    val fail = new Array[Int](nStates)
    val delta = new Array[Int](nStates * sigma)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var a = 0
    while (a < sigma) {
      val t = goto_(a)
      if (t < 0) delta(a) = 0
      else { delta(a) = t; fail(t) = 0; queue.enqueue(t) }
      a += 1
    }
    val emitLists = Array.fill(nStates)(List.empty[Int])
    emitLists(0) = endings.getOrElse(0, Nil)
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      emitLists(s) = endings.getOrElse(s, Nil) ::: emitLists(fail(s))
      var a2 = 0
      while (a2 < sigma) {
        val t = goto_(s * sigma + a2)
        if (t < 0) delta(s * sigma + a2) = delta(fail(s) * sigma + a2)
        else {
          delta(s * sigma + a2) = t
          fail(t) = delta(fail(s) * sigma + a2)
          queue.enqueue(t)
        }
        a2 += 1
      }
    }
    new Automaton(charMap, sigma, delta,
      emitLists.map(_.sorted.toArray), patterns.length)
  }
}
