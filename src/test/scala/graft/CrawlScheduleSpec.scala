package graft

import graft.operators.Urls
import org.scalatest.funsuite.AnyFunSuite

class CrawlScheduleSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val rows =
    Urls.crawlSchedule(spark, "/root/testdata/sf0.001").collect()

  test("politeness invariant: per-host offsets are 0, delay, 2·delay, … gap-free") {
    rows.groupBy(_.getAs[String]("host")).foreach { case (h, rs) =>
      val offs = rs.map(_.getAs[Long]("offset_ms")).sorted.toSeq
      assert(offs == (0L until rs.length.toLong)
        .map(_ * Urls.CrawlDelayMs), s"host $h")
      // two fetches on one host never share a slot; rate = 1/delay
      assert(offs.distinct.length == offs.length, s"host $h collision")
    }
  }

  test("queue order is discovery order (keeper doc_id) within each host") {
    rows.groupBy(_.getAs[String]("host")).foreach { case (h, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank_in_host"))
        .map(_.getAs[Long]("keep_id")).toSeq
      assert(byRank == byRank.sorted, s"host $h not discovery-ordered")
    }
  }

  test("host_depth is the queue length; makespan host carries the max offset") {
    rows.groupBy(_.getAs[String]("host")).foreach { case (_, rs) =>
      assert(rs.forall(_.getAs[Long]("host_depth") == rs.length.toLong))
      assert(rs.map(_.getAs[Long]("offset_ms")).max ==
        (rs.length - 1).toLong * Urls.CrawlDelayMs)
    }
    // more than one host queue exists (the parallelism the schedule buys)
    assert(rows.map(_.getAs[String]("host")).distinct.length > 1)
  }

  test("schedule covers exactly the canonical keepers (one slot per dup group)") {
    val canon = Urls.urlCanon(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == canon.length)
    assert(rows.map(_.getAs[String]("canon_url")).toSet ==
      canon.map(_.getAs[String]("canon_url")).toSet)
  }
}
