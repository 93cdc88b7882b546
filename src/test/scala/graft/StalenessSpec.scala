package graft

import graft.operators.{Snapshots, Staleness}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StalenessSpec extends AnyFunSuite {
  import SparkTestSession._

  test("report equals a first-principles recompute, rank rule exact") {
    val latest = Snapshots.fetchLog(spark, sf)
      .groupBy(col("doc_id")).agg(max(col("ts")).as("ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val srcOf = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val h = latest.values.max
    val bySrc = latest.toSeq.map { case (id, ts) => (srcOf(id), h - ts, id) }
      .groupBy(_._1)

    val got = Staleness.stalenessQuery(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("p50_stale"),
          r.getAs[Long]("p90_stale"), r.getAs[Long]("max_stale"),
          r.getAs[Long]("fresh_micro")))).toMap
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, rows) =>
      val n = rows.length.toLong
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity).map(_._1)
      val p50 = sorted(((n + 1) / 2 - 1).toInt)
      val p90 = sorted(((9 * n + 9) / 10 - 1).toInt)
      val fresh = 1000000L * sorted.count(_ <= Staleness.FreshWithin) / n
      assert(got(src) == ((n, p50, p90, sorted.max, fresh)),
        s"$src: ${got(src)} vs ($n, $p50, $p90, ${sorted.max}, $fresh)")
      assert(p50 <= p90 && p90 <= sorted.max)
    }
  }
}
