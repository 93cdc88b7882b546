package graft

import graft.operators.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SnapshotsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("latest-wins keeps the max-ts fetch; changed tracks distinct versions") {
    val log = Seq(
      (1L, 10L, "h1"), (1L, 20L, "h2"), (1L, 30L, "h2"), // edited once, revisited
      (2L, 10L, "h3"),                                    // single fetch
      (3L, 10L, "h4"), (3L, 40L, "h4")                    // revisit, no change
    ).toDF("doc_id", "ts", "hash")
    val got = Snapshots.latestWins(log, "doc_id")
      .as[(Long, Long, Long, Long, String, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 2L, 30L, "h2", true)))
    assert(got(2L) == ((2L, 1L, 1L, 10L, "h3", false)))
    assert(got(3L) == ((3L, 2L, 1L, 40L, "h4", false)))
  }

  test("fixture log folds to one row per page; edits flagged exactly") {
    val out = Snapshots.snapshotDedup(spark, sf)
    val base = Tables.documents(spark, sf).count()
    assert(out.count() == base, "one kept row per page")
    // changed iff refetched WITH an edit: %6 (gen-1 edit) or %9 (gen-2)
    val wrong = out.filter(
      col("changed") =!= (col("doc_id") % 6 === 0 || col("doc_id") % 9 === 0))
      .count()
    assert(wrong == 0, s"$wrong pages with a wrong changed flag")
    // no-change revisits exist and are NOT flagged (the revisit-interval signal)
    val quietRevisits = out.filter(col("n_fetches") > 1 && !col("changed")).count()
    assert(quietRevisits > 0, "fixture must contain unchanged revisits")
  }

  test("every exchange keys on the page id (bucket-by-key at scale)") {
    // the distinct-version count makes the fold two-phase, but BOTH
    // phases key on doc_id(+hash): with the fetch log bucketed by page
    // key at 100 TB the whole collapse is exchange-free
    val plan = Snapshots.latestWins(
      Snapshots.fetchLog(spark, sf), "doc_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.nonEmpty && exchanges.forall(_.contains("doc_id")),
      s"every exchange must key on doc_id, got: $exchanges")
  }
}
