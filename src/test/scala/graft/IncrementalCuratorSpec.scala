package graft

import graft.operators.{Dedup, IncrementalCurator}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composition parity the piecewise tests can't give: after a
  * multi-batch ingest schedule, the curator's keeper frame must equal
  * the full one-shot recompute EXACTLY — same keepers, same survivor
  * set — regardless of how the corpus was sliced into batches.
  */
class IncrementalCuratorSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("3-batch ingest == full recompute, row for row") {
    val docs = Tables.docsAug(spark, sf).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val sigT = "ic_sigs"
    val lblT = "ic_labels"
    Seq(sigT, s"${sigT}_del", lblT, s"${lblT}_next").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))

    // slice by a hash-ish rule so clusters straddle batches (the
    // planted dups are id+1000000/id+2000000 — a mod-3 slice puts
    // original and copy in DIFFERENT batches for most ids)
    def batch(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === i)
    IncrementalCurator.init(spark, batch(0), sigT, lblT)
    IncrementalCurator.ingest(spark, batch(1), sigT, lblT)
    IncrementalCurator.ingest(spark, batch(2), sigT, lblT)

    val inc = IncrementalCurator.curated(spark, sigT, lblT)
      .as[(Long, Long, Boolean)].collect().toSet
    val full = Dedup.keepFrom(docs.select(col("doc_id")),
      Dedup.minhashPairs(docs).select(col("a_id"), col("b_id")))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(inc == full,
      s"composition diverged: onlyInc=${(inc diff full).take(5)} " +
        s"onlyFull=${(full diff inc).take(5)}")
    // sanity: the schedule actually exercised cross-batch merging
    assert(full.exists(r => !r._3), "fixture has no duplicates to curate")

    Seq(sigT, s"${sigT}_del", lblT).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
