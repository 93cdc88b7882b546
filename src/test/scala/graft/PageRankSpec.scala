package graft

import graft.operators.Crawl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("hub of a star graph out-ranks every spoke; ranks are deterministic") {
    // spokes 1..6 all link to hub 0; hub links back to spoke 1
    val edges = ((1L to 6L).map(s => (s, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val pr = Crawl.pageRank(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(pr.size == 7)
    val hub = pr(0L)
    (2L to 6L).foreach(s => assert(hub > pr(s), s"hub must out-rank spoke $s"))
    // spoke 1 receives the hub's whole rank — it beats the other spokes
    assert(pr(1L) > pr(2L))
    // fixed-point determinism: a second run is bit-identical
    val again = Crawl.pageRank(edges, iters = 5).as[(Long, Long)].collect().toMap
    assert(again == pr)
    // total rank mass never exceeds the initial mass (dangling leak
    // only removes): sum <= N * SCALE/N
    assert(pr.values.sum <= 7L * (Crawl.PrScale / 7L))
  }
}
