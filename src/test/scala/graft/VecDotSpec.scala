package graft

import graft.functions.VecDot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecDotSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("VecDot is bit-identical to the zip_with+aggregate lambda on real vectors") {
    val e = Tables.embeddings(spark, sf).limit(200)
    val both = e.crossJoin(e.select(col("embedding").as("e2")).limit(5))
      .select(VecDot(col("embedding"), col("e2")).as("native"),
        aggregate(zip_with(col("embedding"), col("e2"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (s, v) => s + v).as("hof"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("VecDot handles nulls and small vectors") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array[Float]()), Some(Array[Float]())),
    ).toDF("a", "b")
    val got = df.select(VecDot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) == 0.0)
  }

  test("vec_dot is SQL-callable via GraftExtensions") {
    val got = spark.sql(
      """SELECT vec_dot(cast(array(1.0, 2.0, 3.0) as array<float>),
        |               cast(array(4.0, 5.0, 6.0) as array<float>)) AS d""".stripMargin)
      .as[Double].head()
    assert(got == 32.0)
  }

  test("VecDot keeps the stage in whole-stage codegen") {
    val e = Tables.embeddings(spark, sf)
    val plan = e.select(VecDot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project [vecdot"), s"no codegen in:\n$plan")
  }
}
