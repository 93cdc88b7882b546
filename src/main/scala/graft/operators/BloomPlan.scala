package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q_bloom_plan — runtime-filter SIZING from measured key
  * cardinalities: for each canonical join key, the exact NDV and the
  * optimal Bloom parameters at the target false-positive rate
  * (m = ⌈−n·ln p / ln²2⌉ bits, k = round(m/n · ln 2) hashes), plus
  * whether the filter fits the broadcast budget. This is the PLANNING
  * face of [[RuntimeFilter]]/[[graft.functions.Bloom]]: those apply a
  * filter; this reads the data and says how big it must be — the
  * number that decides bloom-vs-semijoin per join at 100 TB (a filter
  * that blows the broadcast budget costs more than the shuffle it
  * avoids).
  *
  * Determinism: the two irrational constants fold to ONE inlined
  * integer each (micro-fixed in Scala, embedded literally in the
  * oracle SQL — no per-engine libm call exists anywhere); bits/hashes/
  * bytes are then pure integer ceil/round arithmetic over the exact
  * NDV. Scale: one scan per table (all its keys' distinct-counts ride
  * the same pass); NDV is the exact audit — the serve path swaps in
  * [[Hll]] registers (cross-validated against exact in HllSpec) when
  * a key's distinct set outgrows the exact fold.
  */
object BloomPlan {

  /** Target false-positive rate: 1%. */
  val TargetFpp = 0.01

  /** −ln(0.01)/ln²2 and ln 2, micro-fixed once here and inlined in
    * both engines' arithmetic.
    */
  val BitsPerKeyMicro: Long =
    math.floor(-math.log(TargetFpp) / (math.log(2) * math.log(2)) * 1e6 + 0.5).toLong
  val Ln2Micro: Long = math.floor(math.log(2) * 1e6 + 0.5).toLong

  /** Broadcast budget for a runtime filter: 10 MiB. */
  val BroadcastBytes = 10485760L

  def bloomPlanQuery(s: SparkSession, d: String): DataFrame = {
    def plan(df: DataFrame, rel: String, keys: Seq[String]): DataFrame = {
      val agg = df.agg(count(lit(1)).cast("long").as("n_rows"),
        keys.map(k => countDistinct(col(k)).cast("long").as(s"d_$k")): _*)
      agg.select(lit(rel).as("rel"), col("n_rows"),
        explode(array(keys.map(k =>
          struct(lit(k).as("key"), col(s"d_$k").as("ndv"))): _*)).as("u"))
        .select(col("rel"), col("u.key").as("key"), col("n_rows"),
          col("u.ndv").as("ndv"))
    }
    val all = plan(Tables.lineitem(s, d), "lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
      .unionByName(plan(Tables.orders(s, d), "orders", Seq("o_custkey")))
      .unionByName(plan(Tables.events(s, d), "events", Seq("user_id")))
    all
      .withColumn("bloom_bits",
        expr(s"(ndv * $BitsPerKeyMicro + 999999) div 1000000"))
      .withColumn("k_hashes",
        expr(s"(bloom_bits * $Ln2Micro + ndv * 500000) div (ndv * 1000000)"))
      .withColumn("bloom_bytes", expr("(bloom_bits + 7) div 8"))
      .select(col("rel"), col("key"), col("n_rows"), col("ndv"),
        col("bloom_bits"), col("k_hashes"), col("bloom_bytes"),
        (col("bloom_bytes") <= BroadcastBytes).as("broadcastable"))
      .orderBy(col("rel"), col("key"))
  }

  val bloomPlanSql: String = {
    def table(rel: String, from: String, keys: Seq[String]): String = {
      val ds = keys.map(k => s"count(DISTINCT $k)::BIGINT AS d_$k").mkString(", ")
      val rows = keys.map(k =>
        s"SELECT '$rel' AS rel, '$k' AS key, n_rows, d_$k AS ndv FROM agg_$rel")
        .mkString("\n  UNION ALL\n  ")
      s"""agg_$rel AS MATERIALIZED (
         |  SELECT count(*)::BIGINT AS n_rows, $ds FROM $from
         |), rows_$rel AS (
         |  $rows
         |)""".stripMargin
    }
    s"""WITH ${table("lineitem", "lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))},
       |${table("orders", "orders", Seq("o_custkey"))},
       |${table("events", "events", Seq("user_id"))},
       |all_keys AS (
       |  SELECT * FROM rows_lineitem
       |  UNION ALL SELECT * FROM rows_orders
       |  UNION ALL SELECT * FROM rows_events
       |)
       |SELECT rel, key, n_rows, ndv,
       |       (ndv * $BitsPerKeyMicro + 999999) // 1000000 AS bloom_bits,
       |       (((ndv * $BitsPerKeyMicro + 999999) // 1000000) * $Ln2Micro
       |          + ndv * 500000) // (ndv * 1000000) AS k_hashes,
       |       ((ndv * $BitsPerKeyMicro + 999999) // 1000000 + 7) // 8
       |         AS bloom_bytes,
       |       ((ndv * $BitsPerKeyMicro + 999999) // 1000000 + 7) // 8
       |         <= $BroadcastBytes AS broadcastable
       |FROM all_keys
       |ORDER BY rel, key""".stripMargin
  }
}
