package graft

import graft.operators.{FkDiscover, SliceOverlap}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FkDiscoverSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val rep = FkDiscover.fkDiscover(spark, sf).persist()

  private def row(a: String, b: String) =
    rep.filter(col("col_a") === a && col("col_b") === b).collect().head

  test("true foreign keys surface at containment 1 in the FK direction") {
    val custFk = row("customer.c_custkey", "orders.o_custkey")
    assert(custFk.getAs[Boolean]("fk_b_in_a"),
      "o_custkey references c_custkey")
    val orderFk = row("lineitem.l_orderkey", "orders.o_orderkey")
    assert(orderFk.getAs[Boolean]("fk_a_in_b"),
      "l_orderkey references o_orderkey")
    val natFk = row("customer.c_nationkey", "nation.n_nationkey")
    assert(natFk.getAs[Boolean]("fk_a_in_b") && natFk.getAs[Boolean]("fk_b_in_a"),
      "c_nationkey and the 25-value nation key space coincide")
  }

  test("disjoint key spaces never flag") {
    val vals = Seq.tabulate(500)(i => ("left", s"L$i")) ++
      Seq.tabulate(500)(i => ("right", s"R$i"))
    val rep = SliceOverlap.overlapPairs(
      SliceOverlap.signatures(vals.toDF("key", "v"), "key", "v")).collect().head
    assert(rep.getAs[Double]("est_jaccard") == 0.0)
    assert(rep.getAs[Double]("est_contain_a") == 0.0)
  }

  test("a planted strict subset scores containment 1 on its side while Jaccard stays low") {
    val vals = Seq.tabulate(50)(i => ("sub", s"v$i")) ++
      Seq.tabulate(2000)(i => ("super", s"v$i"))
    val rep = SliceOverlap.overlapPairs(
      SliceOverlap.signatures(vals.toDF("key", "v"), "key", "v")).collect().head
    // key order: "sub" < "super" → a = sub
    assert(rep.getAs[Double]("est_contain_a") == 1.0)
    assert(rep.getAs[Double]("est_jaccard") < 0.2)
  }

  test("extreme size asymmetry reports null, not a guess (documented degenerate)") {
    // a 25-value dimension against a dense 15k key space: the dimension's
    // hashes rarely make the union's bottom-k cut, so the sample can be
    // empty — the estimator must say "no evidence" (null), never 0-or-1
    // from nothing. The nation-vs-orderkey pair is exactly this shape.
    val r = row("nation.n_nationkey", "orders.o_orderkey")
    val ca = r.getAs[java.lang.Double]("est_contain_a")
    // either null (no dimension hash sampled) or a genuine estimate —
    // but fk flags must then agree with the sampled evidence
    if (ca == null) assert(r.getAs[Any]("fk_a_in_b") == null)
  }

  test("column values never shuffle: one bottom-k fold per column, no wide exchange of raw values") {
    // a fresh (unpersisted) instance — the cached one's plan collapses
    // to an InMemoryTableScan and hides the aggregate
    val plan = FkDiscover.fkDiscover(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.linesIterator.take(20).mkString("\n"))
    // the ≤|columns|² pair enumeration is a bounded nested loop over the
    // broadcast key list BY DESIGN; what must never appear is an
    // unbounded cartesian over data-sized frames
    assert(!plan.contains("CartesianProduct"))
  }
}
