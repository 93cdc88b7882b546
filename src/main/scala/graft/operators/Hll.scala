package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch as a mergeable register table.
  * `count_distinct` at 100 TB is a corpus-wide exact shuffle on the
  * key; the HLL register table is a fixed m-row frame that any number
  * of partitions/batches fold into with per-bucket MAX — the same
  * associative-merge contract as [[QualitySketch]] (counts add) and
  * `SignatureStore` (pairs union), applied to cardinality. Spark's own
  * `approx_count_distinct` IS an HLL++ under the hood; this operator
  * exists for when the SKETCH ITSELF is the product — stored per
  * source/day, merged across arbitrary slices at read time, something
  * the opaque built-in aggregate cannot do. The reference counts
  * processed pages exactly per run (`Notion_openai_vector_etl.py:
  * 700-719` run stats); a mergeable register table is what that
  * becomes when runs are sharded.
  *
  * Hash parity with the oracle uses the house md5 idiom (7 hex chars →
  * bucket, next 12 hex chars → rank): the rank ρ = leading-zero bits
  * in the 48-bit tail + 1, computed EXACTLY via hex-string arithmetic
  * (strip leading '0's, CASE on the first nonzero nibble) — no float
  * log2, so registers are integer-identical across engines. A
  * production variant would swap in `xxhash64` + bit ops; the md5 form
  * is the cross-engine-checkable one.
  *
  * Estimate is the raw HLL formula E = α·m²/Σ2^(−ρⱼ) (α = 0.709 for
  * m = 64). Σ over powers of two with ≤ 50-bit exponent spread is
  * exact in a double regardless of summation order, so the estimate is
  * also engine-identical. No small/large-range corrections — at
  * n/m ≫ 3 (the regime the oracle query runs in) raw HLL is the
  * standard estimator; see HllSpec for measured error.
  */
object Hll {

  /** Register count for the oracle query: 64 (p = 6). Relative error
    * 1.04/√m ≈ 13% — small enough to check, large enough that the
    * register table stays eyeballable. Library callers pick their own.
    */
  val M = 64

  private[graft] def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** ρ (rank) of the 48-bit tail of `h` (an md5 hex string): leading
    * zero bits + 1, all-zero tail capped at 49. Exact hex-string
    * arithmetic, mirrored verbatim in the oracle SQL.
    */
  private def rho(h: Column): Column = {
    val stripped = regexp_replace(substring(h, 8, 12), "^0+", "")
    val z = lit(12) - length(stripped)
    val nib = substring(stripped, 1, 1)
    val extra = when(nib.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(nib.isin("4", "5", "6", "7"), 1)
      .when(nib.isin("2", "3"), 2)
      .otherwise(3)
    when(stripped === "", 49).otherwise(z * 4 + extra + 1)
  }

  /** Sketch one frame into its dense m-row register table
    * `(bucket, max_rho)` — absent buckets at ρ = 0. One
    * map-side-combined groupBy on the bucket (≤ m groups per
    * partition), then a broadcast fill against `range(m)`: never more
    * than m rows leave any executor.
    */
  def sketch(df: DataFrame, key: Column, m: Int = M): DataFrame = {
    val h = md5(concat(lit("hll:"), key.cast("string")))
    val regs = df
      .select((conv(substring(h, 1, 7), 16, 10).cast("long") % m).as("bucket"),
        rho(h).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("max_rho"))
    df.sparkSession.range(m).toDF("bucket")
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("max_rho"), lit(0)).as("max_rho"))
  }

  /** Merge register tables (any number, any order): per-bucket MAX —
    * associative, idempotent, commutative; asserted in HllSpec.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("bucket")).agg(max(col("max_rho")).as("max_rho"))

  /** Raw HLL estimate read off a dense register table. */
  def estimate(regs: DataFrame, m: Int = M): Double =
    regs.agg((lit(alpha(m) * m * m) /
      sum(pow(lit(2.0), -col("max_rho")))).as("e")).head.getDouble(0)

  /** Estimate with the standard small-range correction (Flajolet et
    * al. 2007): when empty registers remain and the raw estimate is
    * below 2.5m, raw HLL is biased high and linear counting
    * m·ln(m/V) — V = empty registers — is the better estimator. Use
    * this form when n may be comparable to m (per-slice sketches of
    * sparse keys); the oracle query deliberately stays raw so both
    * engines state one formula.
    */
  def estimateCorrected(regs: DataFrame, m: Int = M): Double = {
    val row = regs.agg(
      (lit(alpha(m) * m * m) / sum(pow(lit(2.0), -col("max_rho")))).as("raw"),
      sum(when(col("max_rho") === 0, 1L).otherwise(0L)).as("zeros")).head
    val raw = row.getDouble(0)
    val zeros = row.getLong(1)
    if (zeros > 0 && raw <= 2.5 * m) m * math.log(m.toDouble / zeros) else raw
  }

  /** Grouped sketch: one dense m-row register table PER group value —
    * the per-slice form the merge story exists for (per-source /
    * per-day cardinality sketches, unioned with [[merge]] keyed on the
    * group at read time). Dense fill crosses the ≤|groups| distinct
    * keys with `range(m)` — both sides broadcast-sized.
    */
  def sketchBy(df: DataFrame, group: String, key: Column, m: Int = M): DataFrame = {
    val h = md5(concat(lit("hll:"), key.cast("string")))
    val regs = df
      .select(col(group),
        (conv(substring(h, 1, 7), 16, 10).cast("long") % m).as("bucket"),
        rho(h).as("rho"))
      .groupBy(col(group), col("bucket")).agg(max(col("rho")).as("max_rho"))
    df.select(col(group)).distinct()
      .crossJoin(df.sparkSession.range(m).toDF("bucket"))
      .join(regs, Seq(group, "bucket"), "left")
      .select(col(group), col("bucket"),
        coalesce(col("max_rho"), lit(0)).as("max_rho"))
  }

  /** q_hll_domain — per-source register tables over distinct doc_id,
    * with the per-source raw estimate and exact count alongside; the
    * hash covers every register of every source.
    */
  def hllDomainQuery(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("source"), col("doc_id"))
    val regs = sketchBy(docs, "source", col("doc_id"), M)
    val est = regs.groupBy(col("source"))
      .agg(TextSim.r4(lit(alpha(M) * M * M) /
        sum(pow(lit(2.0), -col("max_rho")))).as("est"))
    val exact = docs.groupBy(col("source"))
      .agg(count_distinct(col("doc_id")).as("n_exact"))
    regs.join(broadcast(est), Seq("source"))
      .join(broadcast(exact), Seq("source"))
      .select(col("source"), col("bucket"), col("max_rho"), col("est"), col("n_exact"))
      .orderBy(col("source"), col("bucket"))
  }

  val hllDomainSql: String =
    s"""WITH parts AS (
       |  SELECT source,
       |         ('0x' || substr(md5('hll:' || doc_id::VARCHAR), 1, 7))::BIGINT % $M AS bucket,
       |         ltrim(substr(md5('hll:' || doc_id::VARCHAR), 8, 12), '0') AS st
       |  FROM documents
       |), rho AS (
       |  SELECT source, bucket,
       |         CASE WHEN st = '' THEN 49
       |              ELSE 4 * (12 - length(st)) +
       |                   CASE WHEN substr(st, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 0
       |                        WHEN substr(st, 1, 1) IN ('4','5','6','7') THEN 1
       |                        WHEN substr(st, 1, 1) IN ('2','3') THEN 2
       |                        ELSE 3 END + 1
       |         END AS rho
       |  FROM parts
       |), grid AS (
       |  SELECT s.source, t.range AS bucket
       |  FROM (SELECT DISTINCT source FROM documents) s CROSS JOIN range($M) t
       |), regs AS (
       |  SELECT grid.source, grid.bucket, coalesce(max(rho.rho), 0) AS max_rho
       |  FROM grid LEFT JOIN rho
       |    ON grid.source = rho.source AND grid.bucket = rho.bucket
       |  GROUP BY grid.source, grid.bucket
       |), est AS (
       |  SELECT source,
       |         ${TextSim.r4Sql(s"0.709 * $M * $M / sum(power(2.0, -max_rho))")} AS est
       |  FROM regs GROUP BY source
       |), exact AS (
       |  SELECT source, count(DISTINCT doc_id) AS n_exact
       |  FROM documents GROUP BY source
       |)
       |SELECT regs.source, bucket, max_rho, est.est, exact.n_exact
       |FROM regs JOIN est ON regs.source = est.source
       |          JOIN exact ON regs.source = exact.source
       |ORDER BY regs.source, bucket""".stripMargin

  /** q_hll — the full register table over distinct `l_orderkey`, with
    * the raw estimate and the exact cardinality alongside (both
    * constant columns; the hash covers all 64 registers, so any
    * register drift fails the gate, not just the rounded estimate).
    */
  def hllQuery(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val regs = sketch(li, col("l_orderkey"), M)
    val est = regs.agg(TextSim.r4(lit(alpha(M) * M * M) /
      sum(pow(lit(2.0), -col("max_rho")))).as("est"))
    val exact = li.agg(count_distinct(col("l_orderkey")).as("n_exact"))
    regs.crossJoin(broadcast(est)).crossJoin(broadcast(exact))
      .select(col("bucket"), col("max_rho"), col("est"), col("n_exact"))
      .orderBy(col("bucket"))
  }

  val hllSql: String =
    s"""WITH h AS (
       |  SELECT md5('hll:' || l_orderkey::VARCHAR) AS h
       |  FROM lineitem
       |), parts AS (
       |  SELECT ('0x' || substr(h, 1, 7))::BIGINT % $M AS bucket,
       |         ltrim(substr(h, 8, 12), '0') AS st
       |  FROM h
       |), rho AS (
       |  SELECT bucket,
       |         CASE WHEN st = '' THEN 49
       |              ELSE 4 * (12 - length(st)) +
       |                   CASE WHEN substr(st, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 0
       |                        WHEN substr(st, 1, 1) IN ('4','5','6','7') THEN 1
       |                        WHEN substr(st, 1, 1) IN ('2','3') THEN 2
       |                        ELSE 3 END + 1
       |         END AS rho
       |  FROM parts
       |), regs AS (
       |  SELECT t.range AS bucket, coalesce(max(rho.rho), 0) AS max_rho
       |  FROM range($M) t LEFT JOIN rho ON t.range = rho.bucket
       |  GROUP BY t.range
       |), est AS (
       |  SELECT ${TextSim.r4Sql(s"0.709 * $M * $M / sum(power(2.0, -max_rho))")} AS est
       |  FROM regs
       |), exact AS (
       |  SELECT count(DISTINCT l_orderkey) AS n_exact FROM lineitem
       |)
       |SELECT bucket, max_rho, est, n_exact
       |FROM regs CROSS JOIN est CROSS JOIN exact
       |ORDER BY bucket""".stripMargin
}
