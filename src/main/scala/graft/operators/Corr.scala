package graft.operators

import graft.Tables
import graft.functions.TextSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pairwise Pearson correlation profile over the fact table's numeric
  * measures — the relationship layer of data profiling, beside
  * `q_col_profile`'s per-column stats, `q_fd_profile`'s exact
  * dependencies and `q_fk_discover`'s cross-table containment: FDs
  * catch deterministic structure, correlation catches the
  * PROBABILISTIC structure (price tracks quantity; discount is
  * independent of tax) that drives join/filter selectivity estimates
  * (`q_selectivity`, `q_join_card`) and flags derived columns a
  * curation pipeline shouldn't treat as independent signals.
  *
  * Determinism (the `q_trend_slope` rule at decimal width): every
  * measure fixes to integer CENTS per row, per-row products stay
  * ≤ ~1.2e14 in LONG, and the five moment sums per pair fold in
  * DECIMAL(38,0) — exact and order-free where double sums fold in
  * partition order and BIGINT Σx² overflows at 100 TB row counts.
  * r = (nΣxy − ΣxΣy)/√((nΣx² − (Σx)²)(nΣy² − (Σy)²)) then runs in
  * double on the SAME exact inputs with the SAME expression shape on
  * both engines (IEEE mult/sub/div/sqrt — engine-identical), one r6
  * round. Zero-variance degenerates report NULL (guard), never 0/0.
  *
  * Scale shape: ONE corpus scan folds all 15 moments map-side into a
  * single 1-row frame (no per-pair passes, no shuffle keyed on rows);
  * the 6-row pair table is unpivoted from that frame. Adding a
  * measure costs one row of this table, not a pass.
  */
object Corr {

  private val Cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def corrQuery(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val li = Tables.table(s, d, "lineitem")
      .filter(Cols.map(col(_).isNotNull).reduce(_ && _))
      .select(Cols.map(c =>
        floor(col(c) * 100 + 0.5).cast("long").as(c)): _*)
    val moments =
      Seq(count(lit(1)).cast(dec).as("n")) ++
        Cols.map(c => sum(col(c).cast(dec)).as(s"s_$c")) ++
        Cols.map(c => sum((col(c) * col(c)).cast(dec)).as(s"ss_$c")) ++
        Cols.combinations(2).map { case Seq(a, b) =>
          sum((col(a) * col(b)).cast(dec)).as(s"sp_${a}_$b")
        }.toSeq
    val m = li.agg(moments.head, moments.tail: _*)
    val dbl = (c: Column) => c.cast("double")
    // one explode over literal pair structs, NOT a union of per-pair
    // selects: a union re-derives the whole moment aggregate (and its
    // corpus scan) once per pair — 6 scans for 6 pairs, caught by the
    // ExplainAudit one-scan invariant
    val pairStructs = Cols.combinations(2).map { case Seq(a, b) =>
      val num = dbl(col("n")) * dbl(col(s"sp_${a}_$b")) -
        dbl(col(s"s_$a")) * dbl(col(s"s_$b"))
      val va = dbl(col("n")) * dbl(col(s"ss_$a")) -
        dbl(col(s"s_$a")) * dbl(col(s"s_$a"))
      val vb = dbl(col("n")) * dbl(col(s"ss_$b")) -
        dbl(col(s"s_$b")) * dbl(col(s"s_$b"))
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("n").cast("long").as("n"),
        when(va > 0d && vb > 0d,
          TextSim.r6(num / sqrt(va * vb))).as("r"))
    }.toSeq
    m.select(explode(array(pairStructs: _*)).as("p"))
      .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
        col("p.n").as("n"), col("p.r").as("r"))
      .orderBy(col("col_a"), col("col_b"))
  }

  val corrSql: String = {
    val cents = Cols.map(c =>
      s"CAST(floor($c * 100 + 0.5) AS BIGINT) AS $c").mkString(", ")
    val sums =
      Seq("count(*)::DECIMAL(38,0) AS n") ++
        Cols.map(c => s"sum($c::DECIMAL(38,0))::DECIMAL(38,0) AS s_$c") ++
        Cols.map(c => s"sum(($c * $c)::DECIMAL(38,0))::DECIMAL(38,0) AS ss_$c") ++
        Cols.combinations(2).map { case Seq(a, b) =>
          s"sum(($a * $b)::DECIMAL(38,0))::DECIMAL(38,0) AS sp_${a}_$b"
        }.toSeq
    val pairs = Cols.combinations(2).map { case Seq(a, b) =>
      val num = s"n::DOUBLE * sp_${a}_$b::DOUBLE - s_$a::DOUBLE * s_$b::DOUBLE"
      val va = s"n::DOUBLE * ss_$a::DOUBLE - s_$a::DOUBLE * s_$a::DOUBLE"
      val vb = s"n::DOUBLE * ss_$b::DOUBLE - s_$b::DOUBLE * s_$b::DOUBLE"
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n::BIGINT AS n,
         |       CASE WHEN ($va) > 0 AND ($vb) > 0 THEN
         |         ${TextSim.r6Sql(s"($num) / sqrt(($va) * ($vb))")}
         |       END AS r
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH cents AS (
       |  SELECT $cents FROM lineitem
       |  WHERE ${Cols.map(c => s"$c IS NOT NULL").mkString(" AND ")}
       |), m AS (
       |  SELECT ${sums.mkString(",\n         ")}
       |  FROM cents
       |)
       |$pairs
       |ORDER BY col_a, col_b""".stripMargin
  }
}
