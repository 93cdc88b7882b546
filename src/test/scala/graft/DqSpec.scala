package graft

import graft.operators.Dq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DqSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def verdicts(df: org.apache.spark.sql.DataFrame): Map[String, (Double, Boolean)] =
    df.select(col("check_name"), col("metric"), col("pass"))
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("clean corpus passes every check") {
    val clean = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val v = verdicts(Dq.suite(clean,
      Tables.lineitem(spark, sf), Tables.orders(spark, sf)))
    assert(v.size == 5)
    v.foreach { case (name, (metric, pass)) =>
      assert(pass, s"clean-corpus check $name failed at metric $metric")
    }
  }

  test("dirty fixture fails exactly the planted checks, with the planted metrics") {
    val v = verdicts(Dq.dqChecks(spark, sf))
    assert(!v("completeness_lang")._2 && !v("unique_doc_id")._2 &&
      !v("range_n_chars")._2,
      s"planted violations must fail their checks: $v")
    assert(v("ri_lineitem_orders")._2 && v("volume_min_rows")._2,
      s"untouched contracts must pass: $v")
    // recompute the planted rates sequentially
    val ids = Tables.documents(spark, sf).select(col("doc_id"))
      .as[Long].collect()
    val rows = ids.map(id => (id, id % 13 != 0, id % 31 != 0)) ++
      ids.filter(_ % 17 == 0).map(id => (id, id % 13 != 0, id % 31 != 0))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(v("completeness_lang")._1 ==
      r6(rows.count(_._2).toDouble / rows.length))
    assert(v("unique_doc_id")._1 ==
      r6(ids.length.toDouble / rows.length))
    assert(v("range_n_chars")._1 ==
      r6(rows.count(_._3).toDouble / rows.length))
  }

  test("referential check catches orphaned foreign keys") {
    val orders = Tables.orders(spark, sf).filter(col("o_orderkey") % 5 =!= 0)
    val v = verdicts(Dq.suite(
      Tables.documents(spark, sf).select(col("doc_id"), col("lang"), col("n_chars")),
      Tables.lineitem(spark, sf), orders))
    assert(!v("ri_lineitem_orders")._2, "dropped parents must fail RI")
    assert(v("ri_lineitem_orders")._1 < 1.0 && v("ri_lineitem_orders")._1 > 0.5)
  }

  test("metric states are distributive: suite over a union equals recount") {
    // completeness over A ∪ B = (nonnullA + nonnullB) / (nA + nB): the
    // merge-by-addition contract that lets a nightly verifier audit
    // only new partitions. Checked by running the suite over a split
    // union and comparing to the one-shot run.
    val docs = Dq.dirtyDocs(spark, sf)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val oneShot = verdicts(Dq.suite(docs,
      Tables.lineitem(spark, sf), Tables.orders(spark, sf)))
    val unioned = verdicts(Dq.suite(a.unionAll(b),
      Tables.lineitem(spark, sf), Tables.orders(spark, sf)))
    assert(oneShot == unioned)
  }
}
