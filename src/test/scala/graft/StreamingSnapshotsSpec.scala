package graft

import java.sql.Timestamp

import graft.operators.Snapshots
import graft.streaming.{FetchIn, StreamingSnapshots}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSnapshotsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("streamed latest-wins state equals the batch collapse, out-of-order included") {
    implicit val sqlCtx = spark.sqlContext
    val log = Snapshots.fetchLog(spark, sf)
      .select(col("doc_id"), col("ts"), col("hash"))
      .as[(Long, Long, String)].collect()
    // deliver NEWEST generation first so stragglers arrive late:
    // the max-ts rule must absorb out-of-order delivery
    val fetches = log.sortBy(-_._2)
      .map(r => FetchIn(r._1, new Timestamp(r._2 * 1000), r._3))
    val (m1, m2) = fetches.splitAt(fetches.length / 2)
    val mem = MemoryStream[FetchIn]
    val q = StreamingSnapshots.collapse(mem.toDS())
      .writeStream.format("memory").queryName("snap_t")
      .outputMode("update").start()
    try {
      mem.addData(m1.toSeq)
      q.processAllAvailable()
      mem.addData(m2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // update mode: last emitted row per page is the converged state
    val streamed = spark.table("snap_t")
      .groupBy(col("doc_id"))
      .agg(max(struct(col("n_fetches"), col("kept_ts"), col("kept_hash")))
        .as("s"))
      .select(col("doc_id"), col("s.kept_ts"), col("s.kept_hash"),
        col("s.n_fetches"))
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val batch = Snapshots.latestWins(
      Snapshots.fetchLog(spark, sf), "doc_id")
      .select(col("doc_id"), col("kept_ts"), col("kept_hash"),
        col("n_fetches"))
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> (r._2 * 1000, r._3, r._4)).toMap
    assert(streamed == batch,
      s"diverged, e.g. ${(streamed.toSet -- batch.toSet).take(3)}")
  }

  test("a late straggler older than the kept row changes nothing") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FetchIn]
    val q = StreamingSnapshots.collapse(mem.toDS())
      .writeStream.format("memory").queryName("snap_late")
      .outputMode("update").start()
    try {
      mem.addData(Seq(FetchIn(1L, new Timestamp(300000L), "h3")))
      q.processAllAvailable()
      mem.addData(Seq(FetchIn(1L, new Timestamp(100000L), "h1")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("snap_late")
      .select(col("kept_hash"), col("n_fetches"))
      .as[(String, Long)].collect()
    assert(rows.forall(_._1 == "h3"), "kept row must stay the newest fetch")
    assert(rows.map(_._2).max == 2L, "straggler still counts as a fetch")
  }
}
