package graft

import graft.operators.Hll
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def regsMap(df: DataFrame): Map[Long, Int] =
    df.select(col("bucket"), col("max_rho").cast("int"))
      .as[(Long, Int)].collect().toMap

  test("sketch is dense: exactly m registers, buckets 0..m-1, rho >= 0") {
    val df = spark.range(1000).toDF("id")
    val regs = regsMap(Hll.sketch(df, col("id"), m = 64))
    assert(regs.size == 64)
    assert(regs.keySet == (0L until 64L).toSet)
    assert(regs.values.forall(_ >= 0))
  }

  test("merge(sketch(a), sketch(b)) == sketch(a union b); merge idempotent") {
    val a = spark.range(0, 5000).toDF("id")
    val b = spark.range(3000, 9000).toDF("id")
    val sa = Hll.sketch(a, col("id"))
    val sb = Hll.sketch(b, col("id"))
    val merged = regsMap(Hll.merge(sa, sb))
    val direct = regsMap(Hll.sketch(a.unionAll(b), col("id")))
    assert(merged == direct, "per-bucket max must equal the one-shot sketch")
    assert(regsMap(Hll.merge(sa, sa)) == regsMap(sa), "idempotent")
  }

  test("duplicates do not move the sketch") {
    val df = spark.range(2000).toDF("id")
    val dups = df.unionAll(df).unionAll(df)
    assert(regsMap(Hll.sketch(df, col("id"))) == regsMap(Hll.sketch(dups, col("id"))))
  }

  test("estimate within 3 sigma at m=256 on 20k distinct keys") {
    val m = 256
    val n = 20000L
    val regs = Hll.sketch(spark.range(n).toDF("id"), col("id"), m)
    val est = Hll.estimate(regs, m)
    val relErr = math.abs(est - n) / n.toDouble
    // std error 1.04/sqrt(256) = 6.5%; 3 sigma ~ 20%
    assert(relErr < 0.20, s"estimate $est vs $n (relErr $relErr)")
  }

  test("small-range correction beats raw when n is comparable to m") {
    val m = 1024
    val n = 100L
    val regs = Hll.sketch(spark.range(n).toDF("id"), col("id"), m)
    val corrected = Hll.estimateCorrected(regs, m)
    assert(math.abs(corrected - n) / n.toDouble < 0.10,
      s"linear counting should land near $n, got $corrected")
    // large range: correction must defer to the raw estimator
    val big = Hll.sketch(spark.range(200000).toDF("id"), col("id"), 64)
    assert(Hll.estimateCorrected(big, 64) == Hll.estimate(big, 64))
  }

  test("grouped sketch: a group's slice equals the standalone sketch; merge across groups") {
    val df = spark.range(6000).toDF("id")
      .withColumn("grp", (col("id") % 3).cast("string"))
    val grouped = Hll.sketchBy(df, "grp", col("id"), m = 64)
    // slice out one group: must equal sketching that group alone
    val slice = regsMap(grouped.filter(col("grp") === "1").drop("grp"))
    val alone = regsMap(Hll.sketch(df.filter(col("grp") === "1"), col("id"), m = 64))
    assert(slice == alone)
    // merging all group slices must equal the ungrouped sketch
    val mergedAll = regsMap(
      grouped.groupBy(col("bucket"))
        .agg(org.apache.spark.sql.functions.max(col("max_rho")).as("max_rho")))
    assert(mergedAll == regsMap(Hll.sketch(df, col("id"), m = 64)))
  }

  test("oracle query carries the full register table plus constant estimate") {
    val out = Hll.hllQuery(spark, sf)
    val rows = out.collect()
    assert(rows.length == Hll.M)
    assert(rows.map(_.getDouble(2)).distinct.length == 1, "estimate constant across rows")
    val exact = rows.head.getLong(3)
    val est = rows.head.getDouble(2)
    assert(math.abs(est - exact) / exact.toDouble < 0.5, s"m=64 estimate $est vs exact $exact")
  }
}
