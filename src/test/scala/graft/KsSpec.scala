package graft

import java.sql.Timestamp
import graft.operators.Ks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def ev(tpe: String, rows: Seq[(Int, Double)]) =
    rows.map { case (h, v) =>
      (tpe, Timestamp.valueOf(f"2024-03-01 ${h}%02d:00:00"), v)
    }

  test("identical halves: D = 0, no drift; disjoint halves: D = 1, drift") {
    // same: identical values both halves (hours 0-9 vs 14-23)
    val same = ev("same", (0 until 10).map(h => (h, (h % 5).toDouble)) ++
      (14 until 24).map(h => (h, (h % 5).toDouble)))
    // moved: early values in [0,5), late in [10,15) — disjoint supports
    val moved = ev("moved", (0 until 10).map(h => (h, (h % 5).toDouble)) ++
      (14 until 24).map(h => (h, 10.0 + (h % 5))))
    val out = Ks.ksDrift((same ++ moved).toDF("event_type", "ts", "value"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_early"), r.getAs[Long]("n_late"),
          r.getAs[Double]("d"), r.getAs[Int]("drifted")))).toMap
    assert(out("same")._3 == 0.0 && out("same")._4 == 0)
    assert(out("moved")._3 == 1.0 && out("moved")._4 == 1)
    assert(out("moved")._1 == 10L && out("moved")._2 == 10L)
  }

  test("empty arm degenerates to NULL, never 0/0") {
    val onlyEarly = ev("e", (0 until 4).map(h => (h, h.toDouble))) ++
      ev("both", Seq((0, 1.0), (23, 2.0)))
    val out = Ks.ksDrift(onlyEarly.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getString(0) -> r).toMap
    val e = out("e")
    assert(e.isNullAt(e.fieldIndex("d")) && e.isNullAt(e.fieldIndex("drifted")))
    assert(!out("both").isNullAt(out("both").fieldIndex("d")))
  }

  test("cells merge by addition: per-batch union equals the one-shot test exactly") {
    val ev = Tables.events(spark, sf).filter(col("value").isNotNull)
    val span = ev.agg(
      ((min(unix_micros(col("ts"))) + max(unix_micros(col("ts")))) / 2)
        .cast("long").as("mid"))
    val flagged = ev.crossJoin(broadcast(span))
      .select(col("event_type"), col("value"),
        (unix_micros(col("ts")) < col("mid")).cast("long").as("early"))
    val a = flagged.filter(col("value") < 50.0)
    val b = flagged.filter(col("value") >= 50.0)
    val merged = Ks.fromCells(
      Ks.mergeCells(Ks.cellsOf(a), Ks.cellsOf(b))).collect().toSet
    val oneShot = Ks.fromCells(Ks.cellsOf(flagged)).collect().toSet
    assert(merged == oneShot)
  }

  test("sequential exact-numerator recompute parity on the events corpus") {
    val got = Ks.ksQuery(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_early"),
        r.getAs[Long]("n_late"), r.getAs[Double]("d")))).toMap

    // midpoint over ALL events (the operator computes the span BEFORE
    // the null-value filter — mirror that, or a null at a span extreme
    // would shift arm membership only on one side)
    val allTs = Tables.events(spark, sf)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    val mid = (allTs.min + allTs.max) / 2
    val rows = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    for ((tpe, grp) <- rows.groupBy(_._1)) {
      val early = grp.filter(_._2 < mid).map(_._3).sorted
      val late = grp.filter(_._2 >= mid).map(_._3).sorted
      val n1 = early.length.toLong; val n2 = late.length.toLong
      val values = (early ++ late).distinct.sorted
      var dnum = 0L
      for (x <- values) {
        val c1 = early.count(_ <= x).toLong
        val c2 = late.count(_ <= x).toLong
        dnum = math.max(dnum, math.abs(c1 * n2 - c2 * n1))
      }
      assert(got(tpe) == ((n1, n2, r6(dnum.toDouble / (n1.toDouble * n2.toDouble)))), tpe)
    }
  }
}
