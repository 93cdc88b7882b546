package graft

import graft.operators.Kanon
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KanonSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("every group at every level reaches k; accounting is exact") {
    val out = Kanon.kanon(spark, sf)
      .select(col("level"), col("n_docs")).as[(Int, Long)].collect()
    val n = Tables.documents(spark, sf).count()
    assert(out.map(_._2).sum == n, "every doc lands in exactly one verdict row")
    assert(out.filter(_._1 < 3).forall(_._2 >= Kanon.K),
      "published groups must reach k")
  }

  test("the ladder cascades: generalization saves rows a one-shot filter suppresses") {
    // rows published at level 1/2 are exactly the ones a flat
    // "group < k -> suppress" rule would have dropped
    val out = Kanon.kanon(spark, sf)
      .select(col("level"), col("n_docs")).as[(Int, Long)].collect()
    val saved = out.filter(r => r._1 == 1 || r._1 == 2).map(_._2).sum
    assert(saved > 0, "fixture must exercise the generalization levels")
    val suppressed = out.filter(_._1 == 3).map(_._2).sum
    val oneShotSuppressed = saved + suppressed
    assert(saved.toDouble / oneShotSuppressed > 0.5,
      s"the ladder should rescue most of the one-shot suppression: $saved of $oneShotSuppressed")
  }

  test("level-0 groups discriminate on the corpus (big and rare both occur)") {
    val meta = Kanon.meta(spark, sf)
    val sizes = meta.groupBy(col("source"), col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("n")).select(col("n")).as[Long].collect()
    assert(sizes.exists(_ >= Kanon.K) && sizes.exists(_ < Kanon.K),
      "fixture tuple must mix big groups with linkage handles")
  }

  test("sequential ladder parity on a hand fixture") {
    val rows = Seq.fill(6)(("s1", "en", 0L)) ++ // level 0 pass
      Seq.fill(3)(("s2", "en", 1L)) ++ Seq.fill(3)(("s3", "en", 1L)) ++ // pool to level 1
      Seq.fill(2)(("s4", "de", 2L)) ++ Seq.fill(3)(("s5", "fr", 2L)) ++ // pool to level 2
      Seq(("s6", "zh", 9L)) // suppressed
    val got = Kanon.ladder(rows.toDF("source", "lang", "len_bucket"), k = 5)
      .select(col("source"), col("lang"), col("len_bucket"), col("level"),
        col("n_docs"))
      .as[(Option[String], Option[String], Option[Long], Int, Long)]
      .collect().toSet
    assert(got == Set(
      (Some("s1"), Some("en"), Some(0L), 0, 6L),
      (None, Some("en"), Some(1L), 1, 6L),
      (None, None, Some(2L), 2, 5L),
      (None, None, None, 3, 1L)))
  }

  test("verdicts are group-level and bounded: output rows <= distinct tuples + 1") {
    val out = Kanon.kanon(spark, sf)
    val tuples = Kanon.meta(spark, sf).distinct().count()
    assert(out.count() <= tuples + 1)
  }

  test("t-closeness: population-mirroring groups score 0; a skewed group leaks even when l-diverse") {
    val rows = Kanon.tCloseness(spark, sf).collect()
    // tv ∈ [0, 1] and a group that IS the population scores near 0 —
    // sanity band on the corpus
    assert(rows.forall(r => {
      val d = r.getAs[Double]("tv_dist"); d >= 0.0 && d <= 1.0
    }))
    // sequential recompute parity: exact integer numerator per group
    val m = Kanon.meta(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getString(1)))
    val byVal = m.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val nTot = m.length.toLong
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = rows.map(r => (r.getString(0), r.getLong(1)) ->
      r.getAs[Double]("tv_dist")).toMap
    for (((src, lb), grp) <- m.groupBy(x => (x._1, x._2))) {
      val nG = grp.length.toLong
      val cgv = grp.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      val num = byVal.map { case (v, cv) =>
        math.abs(cgv.getOrElse(v, 0L) * nTot - cv * nG)
      }.sum
      assert(got((src, lb)) == r6(num.toDouble / (2.0 * nG * nTot)), (src, lb))
    }
  }

  test("t-closeness catches what l-diversity cannot: skewed-but-diverse hand fixture") {
    // population 14/6 over two langs; both groups hold 2 distinct
    // values (l-diverse at L=2) yet both sit tv = 0.2 from the 70/30
    // population — the 9/1 skew group leaks despite passing
    // l-diversity, exactly the gap t-closeness exists to close
    val m = ((0 until 10).map(i => ("A", if (i % 2 == 0) "en" else "de", 0L)) ++
      (0 until 10).map(i => ("B", if (i < 9) "en" else "de", 0L)))
      .toDF("source", "lang", "len_bucket")
    val out = Kanon.tClosenessOf(m).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("tv_dist")).toMap
    // exact rationals: A = |100−140|+|100−60| = 80 → 80/400 = 0.2
    //                  B = |180−140|+|20−60| = 80 → 0.2
    assert(out == Map("A" -> 0.2, "B" -> 0.2))
    // make the leak visible: equal-size mirror groups → tv 0 for both;
    // then skew ONE group and only it moves away from the population
    val mirror = ((0 until 10).map(i => ("A", if (i % 2 == 0) "en" else "de", 0L)) ++
      (0 until 10).map(i => ("B", if (i % 2 == 0) "en" else "de", 0L)))
      .toDF("source", "lang", "len_bucket")
    val m2 = Kanon.tClosenessOf(mirror).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("tv_dist")).toMap
    assert(m2 == Map("A" -> 0.0, "B" -> 0.0))
  }
}
