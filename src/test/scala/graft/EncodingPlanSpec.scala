package graft

import graft.sources.EncodingPlan
import org.scalatest.funsuite.AnyFunSuite

class EncodingPlanSpec extends AnyFunSuite {
  import SparkTestSession._

  test("the advisor picks the textbook encoding per column shape") {
    val r = EncodingPlan.encodingPlanQuery(spark, sf).collect()
      .map(x => x.getAs[String]("key") -> x).toMap
    assert(r.size == 3)

    // sorted key: consecutive deltas are tiny vs a ~2^20 raw width
    val ok = r("l_orderkey")
    assert(ok.getAs[String]("best") == "delta", s"$ok")
    assert(ok.getAs[Long]("delta_bits") < ok.getAs[Long]("raw_bits"))
    assert(ok.getAs[Long]("delta_bits") < ok.getAs[Long]("dict_bits"))

    // low-cardinality columns: dictionary code width = ceil(log2 ndv)
    for (k <- Seq("l_quantity", "l_suppkey")) {
      val row = r(k)
      val ndv = row.getAs[Long]("ndv")
      val expectBits = 64L - java.lang.Long.numberOfLeadingZeros(ndv - 1)
      assert(row.getAs[Long]("dict_bits") == expectBits,
        s"$k: bin width of ndv-1: $row")
      assert(row.getAs[String]("best") == "dict", s"$k: $row")
    }

    // byte math: best_bytes = (min-bits * n + 7) / 8 exactly
    r.values.foreach { row =>
      val bits = Seq(row.getAs[Long]("raw_bits"), row.getAs[Long]("dict_bits"),
        row.getAs[Long]("delta_bits")).min
      assert(row.getAs[Long]("best_bytes") ==
        (bits * row.getAs[Long]("n_rows") + 7L) / 8L, s"$row")
    }
  }
}
