package graft

import graft.functions.{Heavy, TextSim}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Zipf-ish stream: item i appears ~N/i times. Deterministic. */
  private def zipf(items: Int, scale: Int): Seq[String] =
    (1 to items).flatMap(i => Seq.fill(scale / i)(s"w$i"))

  private def exact(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (g, o) => g -> o.size.toLong }

  test("exact when distinct items fit the capacity") {
    val xs = zipf(8, 1000)
    val s = Heavy.fit(xs.toDF("g").repartition(7), "g", k = 16)
    assert(s.total == xs.size)
    assert(s.counters == exact(xs), "no decrement ever fires below capacity")
    assert(s.maxUndercount == 0)
  }

  test("MG guarantees on a skewed stream under any partitioning") {
    val xs = zipf(500, 20000) // ~2.4k distinct-ish, heavy head
    val truth = exact(xs)
    val n = xs.size.toLong
    for (parts <- Seq(1, 4, 13)) {
      val s = Heavy.fit(xs.toDF("g").repartition(parts), "g", k = 50)
      assert(s.total == n)
      val bound = s.maxUndercount
      assert(bound <= n / 51, "accounting bound within the worst case")
      truth.foreach { case (g, c) =>
        val e = s.estimate(g)
        assert(e <= c, s"$g overcounted: $e > $c")
        assert(e >= c - bound, s"$g undercounted past the bound")
      }
      // no false negatives above the threshold
      truth.filter(_._2 > bound).keys.foreach { g =>
        assert(s.counters.contains(g), s"heavy item $g missing")
      }
    }
  }

  test("merge of slice summaries keeps the bound vs the union") {
    val a = zipf(300, 9000)
    val b = zipf(120, 15000) // overlapping head, different tail
    val sa = Heavy.fit(a.toDF("g"), "g", k = 40)
    val sb = Heavy.fit(b.toDF("g"), "g", k = 40)
    val m = sa.merge(sb)
    val truth = exact(a ++ b)
    assert(m.total == (a.size + b.size).toLong)
    assert(m.counters.size <= 40)
    val bound = m.maxUndercount
    truth.foreach { case (g, c) =>
      assert(m.estimate(g) <= c)
      assert(m.estimate(g) >= c - bound)
    }
    truth.filter(_._2 > bound).keys.foreach(g => assert(m.counters.contains(g)))
    // merge order does not affect the guarantee (values may differ)
    val m2 = sb.merge(sa)
    assert(m2.total == m.total && m2.counters.size <= 40)
  }

  test("top of the corpus vocabulary head is recovered on real documents") {
    val toks = Tables.documents(spark, sf)
      .select(explode(TextSim.tokens(col("text"))).as("g"))
    val s = Heavy.fit(toks, "g", k = 200)
    val truthTop = toks.groupBy("g").count()
      .orderBy(col("count").desc, col("g")).limit(5)
      .as[(String, Long)].collect()
    // the true top-5 terms all clear the threshold comfortably -> must
    // be stored, and their estimates must sit within the bound
    truthTop.foreach { case (g, c) =>
      assert(s.counters.contains(g), s"top term $g missing")
      assert(s.estimate(g) <= c && s.estimate(g) >= c - s.maxUndercount)
    }
    assert(s.counters.size <= 200)
  }

  test("empty input yields an empty summary") {
    val s = Heavy.fit(Seq.empty[String].toDF("g"), "g", k = 8)
    assert(s.total == 0 && s.counters.isEmpty && s.estimate("x") == 0)
  }

  test("q_heavy_topk served census equals the exact census (exact regime)") {
    val got = graft.operators.HeavyTopK.heavyTopK(spark, SparkTestSession.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val toks = Tables.documents(spark, SparkTestSession.sf)
      .select(explode(TextSim.tokens(col("text"))).as("term"))
    val truth = toks.groupBy("term").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    val n = truth.map(_._2).sum
    assert(got.length == graft.operators.HeavyTopK.TopN)
    got.zip(truth.take(graft.operators.HeavyTopK.TopN)).zipWithIndex.foreach {
      case (((rank, term, est, nTotal, cSum, under), (tTerm, tCount)), i) =>
        assert(rank == i + 1)
        assert(term == tTerm && est == tCount, s"rank ${i + 1}")
        assert(nTotal == n && cSum == n && under == 0L)
    }
  }
}
