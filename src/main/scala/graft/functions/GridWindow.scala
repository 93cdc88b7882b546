package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.graftshim.toColumn
import org.apache.spark.sql.types.{DataType, IntegerType}

/** A constant-zero partition key that the optimizer CANNOT fold away:
  * `EliminateWindowPartitions` strips foldable partition expressions
  * (so `partitionBy(lit(0))` degenerates back to an empty spec and
  * re-triggers the WindowExec warning this helper exists to retire).
  * Declared non-foldable, deterministic, codegen'd to the literal 0 —
  * identical execution to a constant key, immune to the rule.
  */
case class GridKey() extends LeafExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = 0
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ExprCode.forNonNullValue(JavaCode.literal("0", IntegerType))
}

/** Window spec for an INTENTIONAL single-partition pass over a
  * BOUNDED frame — a value grid (distinct micro-rounded scores,
  * margins, deciles), a dense time grid, or another statistic whose
  * row count is capped by construction, never by the corpus.
  *
  * Partitioning by a constant executes identically to an empty
  * partition spec (all rows meet on one reducer — fine, the frame is
  * bounded) but (a) declares the intent in the code and the plan
  * (`hashpartitioning(0, …)` = audited bounded window, where
  * WindowExec's "No Partition Defined" warning stays reserved for
  * ACCIDENTAL corpus-wide sorts — the r5 verdict's test-log-noise
  * item), and (b) keeps `sbt test` output clean enough that a real
  * unpartitioned-window regression is visible. Never use this on a
  * corpus-sized frame; the cumulative folds that need a true
  * distributed prefix sum go through per-key windows or the
  * band-offset two-pass instead.
  */
object GridWindow {
  def ord(cols: Column*): WindowSpec =
    Window.partitionBy(toColumn(GridKey())).orderBy(cols: _*)

  /** Unordered variant — for whole-frame aggregates (count/sum over
    * the bounded frame) where an ordered spec would silently become a
    * running frame.
    */
  def all: WindowSpec = Window.partitionBy(toColumn(GridKey()))
}
