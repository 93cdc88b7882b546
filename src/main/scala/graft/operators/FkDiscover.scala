package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inclusion-dependency (foreign-key) discovery — the CROSS-table side
  * of data profiling, next to [[FdProfile]]'s intra-table dependencies
  * and [[Dq]]'s referential-integrity CHECK: RI can only verify a
  * relationship someone declared; this DISCOVERS candidates, by
  * estimating both containment directions |A ⊆ B| for every column
  * pair from the same bottom-k signatures [[SliceOverlap]] uses for
  * slice overlap (KMV, Beyer et al. SIGMOD'07 — the union cut is a
  * uniform sample of A∪B; restricting it to A's elements and taking
  * the in-B share estimates |A∩B|/|A| with O(1/√k) error). A column
  * pair with containment ≈ 1 in one direction is a foreign-key
  * candidate (Papenbrock et al.'s SINDY runs the same
  * value-intersection idea exactly; the sketch form never shuffles
  * full value sets).
  *
  * Scale shape: each profiled column folds ONCE through the
  * [[graft.functions.BottomKByHash]] ObjectHashAggregate (≤ k rows per
  * column per partition cross the wire — column values never shuffle);
  * everything pairwise touches only the ≤ |columns|·k signature frame.
  * The column list is bounded (a profiling run enumerates key-shaped
  * columns); values are compared as canonical strings so cross-type
  * key spaces (BIGINT vs VARCHAR ids) still collide where they should.
  */
object FkDiscover {

  /** Candidate FK verdict threshold on the ROUNDED containment
    * estimate (engine-identical decision).
    */
  val Threshold = 0.95

  /** The profiled key-shaped columns: (label, table, column). Both the
    * Spark frame and the oracle CTE are generated from this one list.
    */
  val Columns: Seq[(String, String, String)] = Seq(
    ("customer.c_custkey", "customer", "c_custkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("orders.o_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("nation.n_nationkey", "nation", "n_nationkey"),
    ("customer.c_nationkey", "customer", "c_nationkey"),
    ("supplier.s_nationkey", "supplier", "s_nationkey"))

  /** q_fk_discover — pairwise containment estimates over the profiled
    * columns, with the FK-candidate verdicts both ways. True references
    * (o_custkey → c_custkey, l_orderkey → o_orderkey, *_nationkey →
    * n_nationkey) surface at containment ≈ 1; unrelated key spaces
    * (orderkey vs custkey) stay low.
    */
  def fkDiscover(s: SparkSession, d: String): DataFrame = {
    val vals = Columns.map { case (label, table, column) =>
      Tables.table(s, d, table)
        .select(lit(label).as("key"), col(column).cast("string").as("v"))
    }.reduce(_ unionAll _)
    SliceOverlap.overlapPairs(SliceOverlap.signatures(vals, "key", "v"))
      .select(col("source_a").as("col_a"), col("source_b").as("col_b"),
        col("n_sample"), col("est_jaccard"),
        col("est_contain_a"), col("est_contain_b"),
        (col("est_contain_a") >= Threshold).as("fk_a_in_b"),
        (col("est_contain_b") >= Threshold).as("fk_b_in_a"))
      .orderBy(col("col_a"), col("col_b"))
  }

  val fkDiscoverSql: String = {
    val union = Columns.map { case (label, table, column) =>
      s"SELECT '$label' AS key, $column::VARCHAR AS v FROM $table"
    }.mkString("\n  UNION ALL\n  ")
    val k = SliceOverlap.K
    s"""WITH cols AS (
       |  $union
       |), elems AS (
       |  SELECT DISTINCT key, md5(v) AS h FROM cols
       |), ranked AS (
       |  SELECT key, h, row_number() OVER (PARTITION BY key ORDER BY h) AS rh
       |  FROM elems
       |), sig AS (
       |  SELECT key, h FROM ranked WHERE rh <= $k
       |), keys AS (
       |  SELECT DISTINCT key FROM sig
       |), pairs AS (
       |  SELECT a.key AS pa, b.key AS pb FROM keys a JOIN keys b ON a.key < b.key
       |), tagged AS (
       |  SELECT p.pa, p.pb, s.h,
       |         max(CASE WHEN s.key = p.pa THEN 1 ELSE 0 END) AS ia,
       |         max(CASE WHEN s.key = p.pb THEN 1 ELSE 0 END) AS ib
       |  FROM pairs p JOIN sig s ON s.key = p.pa OR s.key = p.pb
       |  GROUP BY 1, 2, 3
       |), cut AS (
       |  SELECT *, row_number() OVER (PARTITION BY pa, pb ORDER BY h) AS rh
       |  FROM tagged
       |), est AS (
       |  SELECT pa AS col_a, pb AS col_b,
       |         count(*)::BIGINT AS n_sample,
       |         ${TextSim.r6Sql("sum(ia * ib)::DOUBLE / count(*)::DOUBLE")} AS est_jaccard,
       |         CASE WHEN sum(ia) = 0 THEN NULL
       |              ELSE ${TextSim.r6Sql("sum(ia * ib)::DOUBLE / sum(ia)::DOUBLE")} END AS est_contain_a,
       |         CASE WHEN sum(ib) = 0 THEN NULL
       |              ELSE ${TextSim.r6Sql("sum(ia * ib)::DOUBLE / sum(ib)::DOUBLE")} END AS est_contain_b
       |  FROM cut WHERE rh <= $k
       |  GROUP BY 1, 2
       |)
       |SELECT col_a, col_b, n_sample, est_jaccard, est_contain_a, est_contain_b,
       |       est_contain_a >= $Threshold AS fk_a_in_b,
       |       est_contain_b >= $Threshold AS fk_b_in_a
       |FROM est
       |ORDER BY col_a, col_b""".stripMargin
  }
}
