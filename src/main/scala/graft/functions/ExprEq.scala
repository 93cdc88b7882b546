package graft.functions

/** By-value equals/hashCode for Catalyst expressions that carry
  * (possibly nested) ARRAY parameters — codebooks, rotation matrices,
  * bloom bit sets. A case class compares array fields by REFERENCE,
  * so two structurally-identical probes built from the same fitted
  * model would never be `semanticEquals`: plan canonicalization and
  * common-subexpression elimination silently stop working for exactly
  * the expressions that are most expensive to evaluate twice.
  *
  * `deepEquals`/`deepHashCode` dispatch through primitive-array
  * comparisons for the leaves and regular `equals` for everything
  * else (children Expressions included), so one pair of overrides
  * serves every such expression:
  * {{{
  * override def equals(o: Any): Boolean = ExprEq.productEquals(this, o)
  * override def hashCode(): Int = ExprEq.productHash(this)
  * }}}
  */
object ExprEq {

  def productEquals(a: Product, b: Any): Boolean = b match {
    case p: Product if p.getClass == a.getClass =>
      (a.asInstanceOf[AnyRef] eq p.asInstanceOf[AnyRef]) ||
        (a.productArity == p.productArity &&
          a.productIterator.zip(p.productIterator).forall { case (x, y) =>
            java.util.Objects.deepEquals(x, y)
          })
    case _ => false
  }

  def productHash(a: Product): Int =
    java.util.Arrays.deepHashCode(
      a.productIterator.map(_.asInstanceOf[AnyRef]).toArray)
}
