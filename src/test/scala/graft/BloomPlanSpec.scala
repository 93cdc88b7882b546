package graft

import graft.functions.Bloom
import graft.operators.BloomPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomPlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("parameter closed forms: textbook m and k at 1% fpp") {
    // -ln(0.01)/ln^2(2) = 9.585058 bits/key, k = round(m/n ln2) = 7
    assert(BloomPlan.BitsPerKeyMicro == 9585058L)
    assert(BloomPlan.Ln2Micro == 693147L)
    def bits(ndv: Long) = (ndv * BloomPlan.BitsPerKeyMicro + 999999L) / 1000000L
    def k(ndv: Long) = {
      val m = bits(ndv)
      (m * BloomPlan.Ln2Micro + ndv * 500000L) / (ndv * 1000000L)
    }
    assert(bits(1000L) == 9586L, s"ceil(9585.058) = ${bits(1000L)}")
    assert(k(1000L) == 7L)
    assert(k(1000000L) == 7L, "k is scale-free at fixed bits/key")
  }

  test("a filter built at the planned size realizes the target fpp") {
    val n = 2000
    val keys = (0 until n).map(i => s"key_$i").toDF("g")
    val m = ((n.toLong * BloomPlan.BitsPerKeyMicro + 999999L) / 1000000L).toInt
    val f = Bloom.fit(keys, "g", mBits = m, k = 7)
    // no false negatives, ever
    val misses = keys.select(Bloom.hits(array(col("g")), f).as("h"))
      .filter(col("h") === 0).count()
    assert(misses == 0L, "bloom filters cannot false-negative")
    // false positives on 20k fresh keys: expect ~1%, allow 3x slack
    val fresh = (0 until 20000).map(i => s"other_$i").toDF("g")
    val fp = fresh.select(Bloom.hits(array(col("g")), f).as("h"))
      .filter(col("h") > 0).count()
    assert(fp < 600L, s"planned-size filter must hold ~1% fpp, got $fp/20000")
    assert(fp > 0L, "a zero measurement would mean the probe is broken")
  }

  test("the corpus plan is internally consistent") {
    val rows = BloomPlan.bloomPlanQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ndv, bits, bytes) = (r.getAs[Long]("ndv"),
        r.getAs[Long]("bloom_bits"), r.getAs[Long]("bloom_bytes"))
      assert(ndv <= r.getAs[Long]("n_rows"))
      assert(bits >= ndv * 9L && bits <= ndv * 10L + 1L,
        s"~9.59 bits/key: $r")
      assert(bytes == (bits + 7L) / 8L)
      assert(r.getAs[Long]("k_hashes") == 7L)
    }
  }
}
