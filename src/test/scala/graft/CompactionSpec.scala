package graft

import graft.sources.Compaction
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def planOf(files: Seq[(String, Long, Long)],
    target: Long = 100L, keep: Long = 80L) =
    Compaction.plan(files.toDF("source", "file_id", "bytes"), target, keep)
      .as[(String, Long, Long, String, Option[Long], Long, Long)].collect()

  test("healthy files keep, small files bin, every file appears exactly once") {
    val files = Seq(
      ("p", 1L, 90L), ("p", 2L, 70L), ("p", 3L, 60L), ("p", 4L, 40L),
      ("p", 5L, 30L), ("p", 6L, 10L))
    val out = planOf(files)
    assert(out.length == files.length)
    assert(out.map(_._2).sorted.toSeq == (1L to 6L))
    val byId = out.map(r => r._2 -> r).toMap
    assert(byId(1L)._4 == "keep" && byId(1L)._5.isEmpty && byId(1L)._7 == 90L)
    // FFD order 70,60,40,30,10: prefix sums 0,70,130,170,200 -> bins 0,0,1,1,2
    assert(byId(2L)._5 == Some(0L) && byId(3L)._5 == Some(0L))
    assert(byId(4L)._5 == Some(1L) && byId(5L)._5 == Some(1L))
    assert(byId(6L)._5 == Some(2L))
    // bin rollups ride every member row
    assert(byId(2L)._6 == 2L && byId(2L)._7 == 130L)
    assert(byId(4L)._7 == 70L && byId(6L)._7 == 10L)
  }

  test("compacted bytes are conserved and bins never cross partitions") {
    val files = (1L to 30L).map(i => (s"src${i % 3}", i, 20L + i % 7))
    val out = planOf(files, target = 60L, keep = 1000L - 974L) // keep=26
    assert(out.map(_._3).sum == files.map(_._3).sum)
    // every bin's riding rollup equals the recomputed group sum
    out.filter(_._4 == "compact").groupBy(r => (r._1, r._5)).foreach {
      case (_, rows) =>
        assert(rows.forall(_._7 == rows.map(_._3).sum))
        assert(rows.forall(_._6 == rows.length.toLong))
    }
    assert(out.groupBy(_._1).keySet == Set("src0", "src1", "src2"))
  }

  test("bins overshoot the target by less than one file, never more") {
    val files = (1L to 40L).map(i => ("p", i, 35L))
    val out = planOf(files, target = 100L, keep = 80L)
    val bins = out.groupBy(_._5).values
    // 35-byte files against a 100 target: prefix-rule bins hold <= 105
    bins.foreach(rows => assert(rows.head._7 <= 100L + 35L))
  }

  test("all-healthy manifest plans zero compaction") {
    val out = planOf(Seq(("p", 1L, 500L), ("p", 2L, 400L)), keep = 80L)
    assert(out.forall(_._4 == "keep"))
  }
}
