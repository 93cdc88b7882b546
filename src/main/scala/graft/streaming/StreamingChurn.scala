package graft.streaming

import java.sql.Timestamp
import graft.operators.Churn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Survival analysis on the event stream — the continuous face of
  * [[Churn]]: the hazard ladder's ONLY corpus-shaped input is the
  * per-user (first_day, last_day) span frame, and a span is a
  * MIN/MAX fold — associative, commutative, IDEMPOTENT — so the
  * state update is replay-safe for free (the [[StreamingHll]]
  * argument: re-delivering an event cannot move a min or max,
  * where the additive folds need exactly-once). Each micro-batch
  * updates the spans; the ladder itself re-derives per read over the
  * emitted span table with the SAME [[Churn]] arithmetic, so batch ≡
  * stream is definitional once the spans agree.
  *
  * State: one (first_us, last_us) pair per user — the minimum any
  * lifetime analysis can carry; no timeout (a user's death is decided
  * by the HORIZON at read time, not by state expiry — expiring idle
  * users would delete exactly the churned lifetimes the ladder
  * counts).
  *
  * Update mode: every batch emits each TOUCHED user's current span;
  * the reader folds the latest emission per user (latest-wins on the
  * monotone span — the [[StreamingSnapshots]] shape).
  */
object StreamingChurn {

  case class Ev(user_id: Long, ts: Timestamp)
  case class Span(user_id: Long, first_us: Long, last_us: Long)

  private def update(user: Long, evs: Iterator[Ev],
    state: GroupState[(Long, Long)]): Iterator[Span] = {
    var (lo, hi) = state.getOption.getOrElse((Long.MaxValue, Long.MinValue))
    evs.foreach { e =>
      val us = e.ts.getTime * 1000L
      if (us < lo) lo = us
      if (us > hi) hi = us
    }
    state.update((lo, hi))
    Iterator.single(Span(user, lo, hi))
  }

  /** Maintain per-user spans over a streaming `(user_id, ts)` frame. */
  def spans(ev: DataFrame): Dataset[Span] = {
    val s = ev.sparkSession
    import s.implicits._
    ev.select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(update _)
  }

  /** The hazard ladder off a collected span table — [[Churn.churn]]'s
    * arithmetic over (user, first, last) days derived from spans.
    */
  def ladderOf(s: SparkSession, spanRows: Seq[Span]): DataFrame = {
    import s.implicits._
    Churn.churnFromSpans(
      spanRows.toDF("user_id", "first_us", "last_us")
        .select(col("user_id"),
          expr("cast(first_us div 86400000000 as long)").as("first_day_idx"),
          expr("cast(last_us div 86400000000 as long)").as("last_day_idx")))
  }
}
