package graft

import graft.sources.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

  test("morton code matches the sequential bit-interleave reference") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (70000L, 3L)).toDF("x", "y")
    val got = pts.select(col("x"), col("y"),
      Layout.morton(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    def ref(x: Long, y: Long): Long = {
      val mx = x & 0xFFFF; val my = y & 0xFFFF
      (0 until 16).map(b =>
        (((mx >> b) & 1L) << (2 * b)) | (((my >> b) & 1L) << (2 * b + 1))).sum
    }
    got.foreach { case (x, y, z) => assert(z == ref(x, y), s"($x,$y)") }
    // the canonical small cases: (1,0)->1, (0,1)->2, (1,1)->3
    assert(ref(1, 0) == 1L && ref(0, 1) == 2L && ref(1, 1) == 3L)
  }

  /** Per-file bounding boxes of a written parquet directory. */
  private def fileBoxes(path: String): Array[(String, Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy(col("f"))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"))
      .as[(String, Long, Long, Long, Long)].collect()

  test("z-order layout prunes a two-dimensional box; hash layout cannot") {
    val pts = Tables.orders(spark, sf)
      .select(col("o_custkey").as("x"),
        floor(unix_timestamp(col("o_orderdate")) / 86400L).cast("long").as("y"))
      .cache()
    val n = 16
    val zDir = tmp() + "/z"; val hDir = tmp() + "/h"
    Layout.writeZOrdered(pts, zDir, "x", "y", n)
    pts.repartition(n).write.mode("overwrite").parquet(hDir)

    val zb = fileBoxes(zDir); val hb = fileBoxes(hDir)
    assert(zb.length > 4 && hb.length > 4)

    // query box: one narrow custkey band × one narrow day band —
    // the two-predicate filter min/max stats must serve
    val (xs, xe) = {
      val q = pts.stat.approxQuantile("x", Array(0.4, 0.45), 0.0)
      (q(0).toLong, q(1).toLong)
    }
    val (ys, ye) = {
      val q = pts.stat.approxQuantile("y", Array(0.4, 0.45), 0.0)
      (q(0).toLong, q(1).toLong)
    }
    def touched(bs: Array[(String, Long, Long, Long, Long)]): Int =
      bs.count { case (_, x0, x1, y0, y1) =>
        x1 >= xs && x0 <= xe && y1 >= ys && y0 <= ye }
    val (zt, ht) = (touched(zb), touched(hb))
    // hash layout spreads every key range over every file: no pruning
    assert(ht == hb.length, s"hash layout should overlap all files, got $ht/${hb.length}")
    assert(zt <= hb.length / 2,
      s"z-order should prune most files: touched $zt of ${zb.length} (hash $ht/${hb.length})")

    // aggregate pruning quality: total box area must shrink by a lot
    def area(bs: Array[(String, Long, Long, Long, Long)]): Double =
      bs.map { case (_, x0, x1, y0, y1) =>
        (x1 - x0 + 1).toDouble * (y1 - y0 + 1).toDouble }.sum
    assert(area(zb) < area(hb) / 4,
      s"z area ${area(zb)} vs hash ${area(hb)}")
    pts.unpersist()
  }

  test("the written frame is byte-complete (layout is an exchange, not a filter)") {
    val pts = Tables.orders(spark, sf)
      .select(col("o_custkey").as("x"), col("o_orderkey").as("y"))
    val dir = tmp() + "/c"
    Layout.writeZOrdered(pts, dir, "x", "y", 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == pts.count())
    assert(back.select(sum(col("y"))).head().getLong(0) ==
      pts.select(sum(col("y"))).head().getLong(0))
  }
}
