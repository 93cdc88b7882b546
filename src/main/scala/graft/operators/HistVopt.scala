package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** V-optimal histogram over the hourly event-rate series — the
  * OPTIMAL bucketing (Jagadish et al., VLDB'98 dynamic program):
  * choose B contiguous buckets minimizing total within-bucket SSE.
  * The planner rung of the histogram family — [[q_equidepth]] spends
  * equal MASS per bucket and [[q_histogram]] equal WIDTH; this spends
  * buckets where the series actually bends, which is what a
  * cardinality estimator or a downsampling tier wants.
  *
  * Exactness: the series is the bounded hourly grid (the
  * [[Cusum]]/[[Ewma]] driver-fold class — ONE corpus scan folds to
  * ≤ n_hours cells, the DP runs on the driver over the bounded grid,
  * never the corpus); bucket cost rides the integer lattice,
  * sse_micro(j,i) = (Σy²)·1e6 − ((Σy)²·1e6) div len with BigInt
  * intermediates (a 10^11-row corpus overflows int64 in (Σy)²; DuckDB
  * runs the same numerators in HUGEINT and `//` ≡ BigInt truncation
  * on nonnegatives). Tie-break: the smallest split index — strict-
  * improvement updates over ascending j, mirrored by the oracle's
  * (cost, j) window order. The oracle unrolls the B DP rounds as
  * MATERIALIZED CTEs over the n² prefix-cost frame (n = span hours,
  * bounded) and backtracks the argmin chain — any correct DP must
  * hash-match it exactly.
  *
  * Output: one row per bucket `(bucket, lo_t, hi_t, n_hours, sum_y,
  * sse_micro, total_sse_micro)`; empty when the span has fewer hours
  * than buckets (both engines).
  */
object HistVopt {

  /** Bucket count — design constant; the SQL mirror unrolls it. */
  val Buckets = 6

  private val HourUs = 3600000000L

  def histVopt(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sparse = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).cast("long").as("y"))
      .select(unix_micros(col("h")).as("hu"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val empty = s.emptyDataFrame.select(lit(0L).as("bucket"),
      lit(0L).as("lo_t"), lit(0L).as("hi_t"), lit(0L).as("n_hours"),
      lit(0L).as("sum_y"), lit(0L).as("sse_micro"),
      lit(0L).as("total_sse_micro")).limit(0)
    if (sparse.isEmpty) return empty
    val lo = sparse.map(_._1).min
    val n = ((sparse.map(_._1).max - lo) / HourUs).toInt + 1
    if (n < Buckets) return empty
    val ys = Array.fill(n)(0L)
    sparse.foreach { case (hu, y) => ys(((hu - lo) / HourUs).toInt) = y }
    // prefix sums over BigInt: s1(i) = Σ_{t<i} y, s2(i) = Σ_{t<i} y²
    val s1 = Array.fill(n + 1)(BigInt(0))
    val s2 = Array.fill(n + 1)(BigInt(0))
    for (i <- 1 to n) {
      s1(i) = s1(i - 1) + ys(i - 1)
      s2(i) = s2(i - 1) + BigInt(ys(i - 1)) * ys(i - 1)
    }
    val M = BigInt(1000000)
    def sseMicro(j: Int, i: Int): BigInt = {
      val d1 = s1(i) - s1(j)
      (s2(i) - s2(j)) * M - (d1 * d1 * M) / (i - j)
    }
    // dp(b)(i): best cost of cells 1..i in b buckets; split = argmin j
    // (strict-improvement over ascending j keeps the SMALLEST tie)
    val dp = Array.ofDim[BigInt](Buckets + 1, n + 1)
    val split = Array.ofDim[Int](Buckets + 1, n + 1)
    for (i <- 1 to n) { dp(1)(i) = sseMicro(0, i); split(1)(i) = 0 }
    for (b <- 2 to Buckets; i <- b to n) {
      var best: BigInt = null
      var bj = -1
      for (j <- (b - 1) until i) {
        val c = dp(b - 1)(j) + sseMicro(j, i)
        if (best == null || c < best) { best = c; bj = j }
      }
      dp(b)(i) = best; split(b)(i) = bj
    }
    // backtrack the boundary chain
    val bounds = Array.fill(Buckets + 1)(0)
    bounds(Buckets) = n
    for (b <- Buckets until 1 by -1) bounds(b - 1) = split(b)(bounds(b))
    val total = dp(Buckets)(n)
    val rows = (1 to Buckets).map { b =>
      val (j, i) = (bounds(b - 1), bounds(b))
      (b.toLong, j.toLong, (i - 1).toLong, (i - j).toLong,
        (s1(i) - s1(j)).toLong, sseMicro(j, i).toLong, total.toLong)
    }
    rows.toDF("bucket", "lo_t", "hi_t", "n_hours", "sum_y", "sse_micro",
      "total_sse_micro").orderBy(col("bucket"))
  }

  val histVoptSql: String = {
    // unrolled DP round b: best over j of dp{b-1}(j) + cost(j, i),
    // ties to the smallest j (window order (tot, j))
    def round(b: Int): String =
      s"""dp$b AS MATERIALIZED (
         |  SELECT i, tot AS cost, j AS split FROM (
         |    SELECT c.i, d.i AS j, d.cost + c.sse AS tot,
         |           row_number() OVER (PARTITION BY c.i
         |             ORDER BY d.cost + c.sse, d.i) AS rn
         |    FROM dp${b - 1} d JOIN cost c ON c.j = d.i
         |    WHERE d.i >= ${b - 1})
         |  WHERE rn = 1
         |)""".stripMargin
    val bk = (Buckets to 1 by -1).map { b =>
      if (b == Buckets)
        s"""bk$b AS (
           |  SELECT $b AS bucket, d.split AS j, nn.n AS i
           |  FROM nn JOIN dp$b d ON d.i = nn.n
           |)""".stripMargin
      else
        s"""bk$b AS (
           |  SELECT $b AS bucket, d.split AS j, p.j AS i
           |  FROM bk${b + 1} p JOIN dp$b d ON d.i = p.j
           |)""".stripMargin
    }.mkString(",\n")
    s"""WITH hours AS (
       |  SELECT h, (row_number() OVER (ORDER BY h) - 1)::BIGINT AS t
       |  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
       |        FROM (SELECT date_trunc('hour', min(ts)) AS lo,
       |                     date_trunc('hour', max(ts)) AS hi FROM events))
       |), cells AS (
       |  SELECT hours.t, coalesce(agg.y, 0)::BIGINT AS y
       |  FROM hours LEFT JOIN (
       |    SELECT date_trunc('hour', ts) AS h, count(*)::BIGINT AS y
       |    FROM events GROUP BY 1) agg ON agg.h = hours.h
       |), nn AS (SELECT count(*)::BIGINT AS n FROM cells),
       |pref AS MATERIALIZED (
       |  SELECT t + 1 AS i,
       |         sum(y) OVER (ORDER BY t)::HUGEINT AS s1,
       |         sum(y::HUGEINT * y) OVER (ORDER BY t)::HUGEINT AS s2
       |  FROM cells
       |  UNION ALL
       |  SELECT 0, 0::HUGEINT, 0::HUGEINT
       |), cost AS MATERIALIZED (
       |  SELECT pj.i AS j, pi.i AS i,
       |         (pi.s2 - pj.s2) * 1000000
       |           - ((pi.s1 - pj.s1) * (pi.s1 - pj.s1) * 1000000)
       |             // (pi.i - pj.i) AS sse
       |  FROM pref pj JOIN pref pi ON pi.i > pj.i
       |),
       |dp1 AS MATERIALIZED (
       |  SELECT i, sse AS cost, 0::BIGINT AS split FROM cost WHERE j = 0
       |),
       |${(2 to Buckets).map(round).mkString(",\n")},
       |$bk,
       |bks AS (
       |  ${(1 to Buckets).map(b => s"SELECT bucket, j, i FROM bk$b")
              .mkString("\n       |  UNION ALL\n       |  ")}
       |), tot AS (
       |  SELECT d.cost AS total FROM nn JOIN dp$Buckets d ON d.i = nn.n
       |)
       |SELECT b.bucket::BIGINT AS bucket, b.j::BIGINT AS lo_t,
       |       (b.i - 1)::BIGINT AS hi_t, (b.i - b.j)::BIGINT AS n_hours,
       |       (pi.s1 - pj.s1)::BIGINT AS sum_y,
       |       c.sse::BIGINT AS sse_micro,
       |       t.total::BIGINT AS total_sse_micro
       |FROM bks b
       |JOIN cost c ON c.j = b.j AND c.i = b.i
       |JOIN pref pj ON pj.i = b.j
       |JOIN pref pi ON pi.i = b.i
       |CROSS JOIN tot t
       |ORDER BY bucket""".stripMargin
  }
}
