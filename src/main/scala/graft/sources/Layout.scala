package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout — Z-order (Morton) clustering for
  * data skipping. Parquet prunes row groups by per-file min/max
  * column stats; a table range-partitioned and sorted on ONE key
  * skips perfectly on that key and not at all on any other. Where
  * queries filter two dimensions (time × tenant, domain × shard,
  * custkey × date), interleaving the key bits gives every file a
  * tight bounding BOX in both dimensions, so min/max stats prune on
  * either predicate — the standard lakehouse layout trick, built here
  * from plain Spark exchanges (repartitionByRange on the morton
  * expression + sortWithinPartitions), no table-format dependency.
  *
  * Everything is integer bit arithmetic — the Spark Column and the
  * DuckDB oracle SQL are generated from the SAME term list, so the
  * codes are engine-identical by construction.
  *
  * Scale shape: the morton code is a per-row codegen expression on
  * the scan; the layout write is ONE range exchange (sampled range
  * boundaries — Spark's RangePartitioner) with an in-partition sort,
  * exactly the cost of any sorted write. Nothing about the layout is
  * consulted at read time — pruning falls out of the parquet stats
  * the sorted files naturally carry.
  */
object Layout {

  /** Interleave the low `bits` of x (even positions) and y (odd
    * positions): the Morton / Z-order code. Inputs are masked to
    * `bits`, so callers own the choice of how coordinates fold into
    * the grid (scale, offset, modulo).
    */
  def morton(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val mx = x.cast("long").bitwiseAND(lit(mask))
    val my = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { b =>
      shiftleft(shiftright(mx, b).bitwiseAND(lit(1L)), 2 * b)
        .plus(shiftleft(shiftright(my, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ + _)
  }

  /** SQL mirror of [[morton]] over expression strings — same terms,
    * same masking, emitted for the DuckDB oracle.
    */
  def mortonSql(x: String, y: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    val mx = s"(($x)::BIGINT & $mask)"
    val my = s"(($y)::BIGINT & $mask)"
    (0 until bits).map { b =>
      s"((($mx >> $b) & 1) << ${2 * b}) + ((($my >> $b) & 1) << ${2 * b + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Write `df` Z-order-clustered on (xCol, yCol): one range exchange
    * on the morton code (sampled boundaries → `numFiles` balanced
    * output files), in-partition sort so row groups inside a file are
    * box-tight too. The morton expression never materializes as data
    * — it exists only as the exchange/sort key.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
    numFiles: Int, bits: Int = 16): Unit = {
    val z = morton(col(xCol), col(yCol), bits)
    df.repartitionByRange(numFiles, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-partition bounding boxes of a frame under its CURRENT
    * physical distribution — the diagnostic behind the skip test:
    * `(pid, n, x_min, x_max, y_min, y_max)`. Pruning quality is the
    * sum over files of box area; smaller = a point/range predicate
    * overlaps fewer files.
    */
  def partitionBoxes(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.select(spark_partition_id().as("pid"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))

  /** Coarse z-cell granularity for [[zorderCells]]: codes >> CellShift. */
  val CellShift = 14

  /** q_zorder — the clustering structure made visible: orders keyed by
    * (custkey, order day) → 16-bit morton code → per-coarse-cell
    * count and per-dimension extents. The extents ARE the min/max
    * stats a parquet file laid out by [[writeZOrdered]] would carry —
    * the oracle-checked face of the layout op (the write itself is
    * exercised in LayoutSpec).
    */
  def zorderCells(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_custkey").as("x"),
        floor(unix_timestamp(col("o_orderdate")) / 86400L).cast("long").as("y"))
      .select(col("x"), col("y"), morton(col("x"), col("y")).as("z"))
      .groupBy(shiftright(col("z"), CellShift).as("cell"))
      .agg(count(lit(1)).cast("long").as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy(col("cell"))

  val zorderCellsSql: String = {
    val z = mortonSql("x", "y")
    s"""WITH pts AS (
       |  SELECT o_custkey::BIGINT AS x,
       |         floor(date_part('epoch', o_orderdate) / 86400)::BIGINT AS y
       |  FROM orders
       |), coded AS (
       |  SELECT x, y, $z AS z FROM pts
       |)
       |SELECT (z >> $CellShift) AS cell, count(*)::BIGINT AS n,
       |       min(x) AS x_min, max(x) AS x_max,
       |       min(y) AS y_min, max(y) AS y_max
       |FROM coded
       |GROUP BY cell
       |ORDER BY cell""".stripMargin
  }
}
