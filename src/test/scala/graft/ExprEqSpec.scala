package graft

import graft.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Array-parameter expressions must compare BY VALUE: two probes
  * built from the same fitted model (equal arrays, different
  * instances) have to be `semanticEquals`, or subexpression
  * elimination and plan canonicalization silently skip them.
  */
class ExprEqSpec extends AnyFunSuite {

  private val sChild = Literal.create(Seq("a", "b"), ArrayType(StringType))
  private val vChild = Literal.create(Seq(1.0f, 2.0f), ArrayType(FloatType))

  test("equal-by-content instances are semanticEquals; unequal are not") {
    val bits = Array(5L, 9L)
    assert(BloomHitsExpr(sChild, bits, 5)
      .semanticEquals(BloomHitsExpr(sChild, bits.clone(), 5)))
    assert(!BloomHitsExpr(sChild, bits, 5)
      .semanticEquals(BloomHitsExpr(sChild, Array(5L, 8L), 5)))

    val coefs = Array(Array(0.5, -0.25), Array(1.5, 2.0))
    def cl2() = coefs.map(_.clone())
    assert(HyperplaneBitsExpr(vChild, coefs)
      .semanticEquals(HyperplaneBitsExpr(vChild, cl2())))
    assert(HyperplaneProbesExpr(vChild, coefs, 2, 1)
      .semanticEquals(HyperplaneProbesExpr(vChild, cl2(), 2, 1)))
    assert(!HyperplaneProbesExpr(vChild, coefs, 2, 1)
      .semanticEquals(HyperplaneProbesExpr(vChild, coefs, 2, 2)))
    assert(RotateVecExpr(vChild, coefs)
      .semanticEquals(RotateVecExpr(vChild, cl2())))

    assert(NearestCentroidsExpr(vChild, Array(1L, 2L),
      Array(Array(1f, 0f), Array(0f, 1f)), Array(1.0, 1.0), 1)
      .semanticEquals(NearestCentroidsExpr(vChild, Array(1L, 2L),
        Array(Array(1f, 0f), Array(0f, 1f)), Array(1.0, 1.0), 1)))

    val tbl = Array(Array(Array(0.1, 0.2), Array(0.3, 0.4)))
    assert(SdcDotExpr(sChild, sChild, tbl)
      .semanticEquals(SdcDotExpr(sChild, sChild, tbl.map(_.map(_.clone())))))
    assert(!SdcDotExpr(sChild, sChild, tbl)
      .semanticEquals(SdcDotExpr(sChild, sChild,
        Array(Array(Array(0.1, 0.2), Array(0.3, 0.5))))))
  }

  test("hashCode agrees with by-value equality (map/set semantics)") {
    val bits = Array(5L, 9L)
    assert(BloomHitsExpr(sChild, bits, 5).hashCode ==
      BloomHitsExpr(sChild, bits.clone(), 5).hashCode)
    val coefs = Array(Array(0.5, -0.25))
    assert(RotateVecExpr(vChild, coefs).hashCode ==
      RotateVecExpr(vChild, coefs.map(_.clone())).hashCode)
  }
}
