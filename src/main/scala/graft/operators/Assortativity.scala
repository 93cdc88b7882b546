package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Degree assortativity of the crawl graph (Newman 2002): the Pearson
  * correlation of (out-degree of source, in-degree of target) over
  * EDGES — the one-number answer to "do hubs link to hubs?". Positive
  * = assortative (social-network-like, hub cores), negative =
  * disassortative (web-like, hubs point at leaves — the shape that
  * makes top-degree seeding effective and epidemic thresholds vanish).
  * Complements [[GraphStats]] (reciprocity/density) and
  * [[q_degree_dist]] (the marginals — assortativity is their edge
  * JOINT structure, which the marginals cannot see).
  *
  * Exactness: the q_corr recipe — exact decimal(38,0) moment sums
  * over the edge frame (n, Σx, Σy, Σx², Σy², Σxy fold map-side in one
  * pass), then ONE r6-rounded double sqrt on the 1-row frame, both
  * engines sharing the literal rounding.
  *
  * Scale: two degree folds over edges (map-side partial agg to ≤|V|
  * rows), decorated back by two co-partitioned joins (at 10^10 edges
  * both join keys are the edge's own endpoints — bucket-aligned), one
  * moment fold to 1 row. Nothing quadratic anywhere.
  */
object Assortativity {

  def assortativity(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val e = Tables.edgesShared(s, d)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).cast("long").as("x"))
    val indeg = e.groupBy(col("dst")).agg(count(lit(1)).cast("long").as("y"))
    val xy = e.join(outdeg, Seq("src")).join(indeg, Seq("dst"))
    val m = xy.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum((col("y") * col("y")).cast(dec)).as("syy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"))
    val dbl = (c: Column) => c.cast("double")
    val num = dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))
    val vx = dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))
    val vy = dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy"))
    m.select(col("n").cast("long").as("n_edges"),
      expr("cast(sx div n as bigint)").as("mean_outdeg"),
      expr("cast(sy div n as bigint)").as("mean_indeg"),
      when(vx > 0d && vy > 0d, TextSim.r6(num / sqrt(vx * vy)))
        .as("assortativity"))
  }

  private type Column = org.apache.spark.sql.Column

  val assortativitySql: String =
    s"""WITH ${Tables.edgesSql},
       |outdeg AS (SELECT src, count(*)::BIGINT AS x FROM edges GROUP BY src),
       |indeg AS (SELECT dst, count(*)::BIGINT AS y FROM edges GROUP BY dst),
       |m AS (
       |  SELECT count(*)::DECIMAL(38,0) AS n,
       |         sum(x::DECIMAL(38,0))::DECIMAL(38,0) AS sx,
       |         sum(y::DECIMAL(38,0))::DECIMAL(38,0) AS sy,
       |         sum((x * x)::DECIMAL(38,0))::DECIMAL(38,0) AS sxx,
       |         sum((y * y)::DECIMAL(38,0))::DECIMAL(38,0) AS syy,
       |         sum((x * y)::DECIMAL(38,0))::DECIMAL(38,0) AS sxy
       |  FROM edges e
       |  JOIN outdeg o ON o.src = e.src
       |  JOIN indeg i ON i.dst = e.dst
       |)
       |SELECT n::BIGINT AS n_edges,
       |       (sx::HUGEINT // n::HUGEINT)::BIGINT AS mean_outdeg,
       |       (sy::HUGEINT // n::HUGEINT)::BIGINT AS mean_indeg,
       |       CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
       |             AND (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
       |            THEN ${TextSim.r6Sql(
      "(n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) / " +
        "sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * " +
        "(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))")}
       |       END AS assortativity
       |FROM m""".stripMargin
}
