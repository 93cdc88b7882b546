package graft.sources

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** q_encoding_plan — the column-encoding ADVISOR: for each integer
  * column, the bits/value each parquet encoding family would spend —
  * PLAIN (raw bit width of the max), RLE_DICTIONARY (⌈log₂ ndv⌉ code
  * width), DELTA_BINARY_PACKED (sign + bit width of the largest
  * in-row-group delta) — and which wins. The codec face of the layout
  * trilogy (`q_zorder` clusters, `q_compaction` right-sizes files,
  * `q_prune_stats` measures the skipping; this prices the bytes
  * inside): a sorted key wants delta, a low-cardinality key wants
  * dict, and choosing wrong multiplies the scan cost the other three
  * operators just optimized.
  *
  * Faithful to how writers actually choose: deltas are measured
  * WITHIN row-group-sized segments (1000-order blocks in the
  * canonical (orderkey, linenumber) order) with a PARTITIONED window
  * — fully parallel, no global sort, segment boundaries reset exactly
  * like a row group does. All arithmetic is integer (bit widths via
  * length(bin(x)) — both engines); ndv is the exact audit
  * ([[graft.operators.Hll]] at serve scale). Tie-break prefers
  * delta, then dict, then raw (matching the parquet writer's
  * preference for the more compressible stream).
  *
  * Scale: ONE lineitem scan — the 3 lag columns ride one partitioned
  * window, the distinct counts ride the final fold.
  */
object EncodingPlan {

  /** Orders per delta segment (the simulated row group). */
  val SegOrders = 1000L

  private case class Key(name: String, expr: String)

  private val Keys = Seq(
    Key("l_orderkey", "cast(l_orderkey as bigint)"),
    Key("l_suppkey", "cast(l_suppkey as bigint)"),
    Key("l_quantity", "cast(l_quantity as bigint)"))

  def encodingPlanQuery(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d)
      .select(col("l_linenumber").as("ln") +:
        Keys.map(k => expr(k.expr).as(k.name)): _*)
    val w = Window
      .partitionBy(expr(s"l_orderkey div $SegOrders"))
      .orderBy(col("l_orderkey"), col("ln"))
    val lagged = Keys.foldLeft(base) { (df, k) =>
      df.withColumn(s"d_${k.name}",
        abs(col(k.name) - lag(col(k.name), 1).over(w)))
    }
    val agg = lagged.agg(count(lit(1)).cast("long").as("n_rows"),
      Keys.flatMap(k => Seq(
        countDistinct(col(k.name)).cast("long").as(s"ndv_${k.name}"),
        max(col(k.name)).as(s"vmax_${k.name}"),
        max(col(s"d_${k.name}")).as(s"dmax_${k.name}"))): _*)
    val rows = agg.select(col("n_rows"),
      explode(array(Keys.map(k => struct(
        lit(k.name).as("key"),
        col(s"ndv_${k.name}").as("ndv"),
        col(s"vmax_${k.name}").as("vmax"),
        col(s"dmax_${k.name}").as("dmax"))): _*)).as("u"))
      .select(col("n_rows"), col("u.key").as("key"), col("u.ndv").as("ndv"),
        col("u.vmax").as("vmax"), col("u.dmax").as("dmax"))
    def bitsOf(x: Column): Column = length(bin(x)).cast("long")
    rows
      .withColumn("raw_bits",
        when(col("vmax") > 0, bitsOf(col("vmax"))).otherwise(1L))
      .withColumn("dict_bits",
        when(col("ndv") > 1, bitsOf(col("ndv") - 1)).otherwise(1L))
      .withColumn("delta_bits",
        when(col("dmax").isNull || col("dmax") === 0, 1L)
          .otherwise(bitsOf(col("dmax")) + 1L))
      .withColumn("best",
        when(col("delta_bits") <= col("dict_bits") &&
          col("delta_bits") <= col("raw_bits"), "delta")
          .when(col("dict_bits") <= col("raw_bits"), "dict")
          .otherwise("raw"))
      .withColumn("best_bits",
        least(col("raw_bits"), col("dict_bits"), col("delta_bits")))
      .select(col("key"), col("n_rows"), col("ndv"),
        col("raw_bits"), col("dict_bits"), col("delta_bits"),
        col("best"), expr("(best_bits * n_rows + 7) div 8").as("best_bytes"))
      .orderBy(col("key"))
  }

  val encodingPlanSql: String = {
    val lags = Keys.map(k =>
      s"abs(${k.expr} - lag(${k.expr}) OVER w) AS d_${k.name}").mkString(",\n       |         ")
    val aggs = Keys.map(k =>
      s"""count(DISTINCT ${k.name})::BIGINT AS ndv_${k.name},
         |         max(${k.name}) AS vmax_${k.name},
         |         max(d_${k.name}) AS dmax_${k.name}""".stripMargin)
      .mkString(",\n         ")
    val sel = Keys.map(k => s"${k.expr} AS ${k.name}").mkString(", ")
    val rows = Keys.map(k =>
      s"SELECT n_rows, '${k.name}' AS key, ndv_${k.name} AS ndv, vmax_${k.name} AS vmax, dmax_${k.name} AS dmax FROM agg")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH base AS (
       |  SELECT $sel,
       |         $lags
       |  FROM lineitem
       |  WINDOW w AS (PARTITION BY cast(l_orderkey AS bigint) // $SegOrders
       |               ORDER BY l_orderkey, l_linenumber)
       |), agg AS MATERIALIZED (
       |  SELECT count(*)::BIGINT AS n_rows,
       |         $aggs
       |  FROM base
       |), rows_k AS (
       |  $rows
       |)
       |SELECT key, n_rows, ndv,
       |       CASE WHEN vmax > 0 THEN length(bin(vmax))::BIGINT ELSE 1 END AS raw_bits,
       |       CASE WHEN ndv > 1 THEN length(bin(ndv - 1))::BIGINT ELSE 1 END AS dict_bits,
       |       CASE WHEN dmax IS NULL OR dmax = 0 THEN 1
       |            ELSE length(bin(dmax))::BIGINT + 1 END AS delta_bits,
       |       CASE WHEN (CASE WHEN dmax IS NULL OR dmax = 0 THEN 1
       |                       ELSE length(bin(dmax))::BIGINT + 1 END)
       |                 <= (CASE WHEN ndv > 1 THEN length(bin(ndv - 1))::BIGINT ELSE 1 END)
       |             AND (CASE WHEN dmax IS NULL OR dmax = 0 THEN 1
       |                       ELSE length(bin(dmax))::BIGINT + 1 END)
       |                 <= (CASE WHEN vmax > 0 THEN length(bin(vmax))::BIGINT ELSE 1 END)
       |            THEN 'delta'
       |            WHEN (CASE WHEN ndv > 1 THEN length(bin(ndv - 1))::BIGINT ELSE 1 END)
       |                 <= (CASE WHEN vmax > 0 THEN length(bin(vmax))::BIGINT ELSE 1 END)
       |            THEN 'dict' ELSE 'raw' END AS best,
       |       (least(CASE WHEN vmax > 0 THEN length(bin(vmax))::BIGINT ELSE 1 END,
       |              CASE WHEN ndv > 1 THEN length(bin(ndv - 1))::BIGINT ELSE 1 END,
       |              CASE WHEN dmax IS NULL OR dmax = 0 THEN 1
       |                   ELSE length(bin(dmax))::BIGINT + 1 END)
       |          * n_rows + 7) // 8 AS best_bytes
       |FROM rows_k
       |ORDER BY key""".stripMargin
  }
}
