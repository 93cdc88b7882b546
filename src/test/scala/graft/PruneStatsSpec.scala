package graft

import graft.sources.PruneStats
import org.scalatest.funsuite.AnyFunSuite

class PruneStatsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def byKey(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[String]("layout"), r.getAs[String]("kind")) ->
      ((r.getAs[Long]("n_files"), r.getAs[Long]("file_hits"),
        r.getAs[Long]("prune_micro")))).toMap

  test("closed form on the complete 16x16 grid: tiles vs row stripes") {
    // k row-major in y => arrival files are y-stripes (y-box one value,
    // x-box full range); z-order files are exact 4x4 tiles (a complete
    // 2^n grid's consecutive 16-code chunks ARE the morton quadrants)
    val rows = (0L until 256L).map(k => (k, k % 16L, k / 16L))
      .toDF("k", "x", "y")
    val r = byKey(PruneStats.pruneStats(rows, rowsPerFile = 16, numPreds = 8)
      .collect())
    assert(r.values.forall(_._1 == 16L), s"16 files per layout: $r")
    // x_point preds v = (15*i) div 9: every y-stripe spans all x -> no
    // pruning; each tile column holds v -> 4 of 16 files per pred
    assert(r(("arrival", "x_point")) == ((16L, 128L, 0L)), s"$r")
    assert(r(("zorder", "x_point")) == ((16L, 32L, 750000L)), s"$r")
    // y_range preds [(15(i-1)) div 8, (15i) div 8]: stripes hit
    // hi-lo+1 files (2+3*7=23); tiles hit 4 per overlapped tile row
    // (11 rows -> 44)
    assert(r(("arrival", "y_range")) == ((16L, 23L, 820312L)), s"$r")
    assert(r(("zorder", "y_range")) == ((16L, 44L, 656250L)), s"$r")
    // the tradeoff the operator exists to show: a single-key sort wins
    // on ITS key, z-order prunes on BOTH dimensions at once
    assert(r(("arrival", "y_range"))._3 > r(("zorder", "y_range"))._3)
    assert(r(("zorder", "x_point"))._3 > r(("arrival", "x_point"))._3)
  }

  test("on the orders table, arrival order cannot prune custkey points") {
    import org.apache.spark.sql.functions._
    val pts = Tables.orders(spark, sf).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("x"),
      floor(unix_timestamp(col("o_orderdate")) / 86400L).cast("long").as("y"))
    // sf0.001 has ~1500 orders: 32-row files give file-stat granularity
    val r = byKey(PruneStats.pruneStats(pts, rowsPerFile = 32, numPreds = 16)
      .collect())
    assert(r.size == 4)
    // arrival order is uncorrelated with both dimensions: z-order must
    // out-prune it on each
    assert(r(("zorder", "x_point"))._3 > r(("arrival", "x_point"))._3, s"$r")
    assert(r(("zorder", "y_range"))._3 > 10L * r(("arrival", "y_range"))._3,
      s"date ranges should prune an order of magnitude better z-ordered: $r")
  }
}
