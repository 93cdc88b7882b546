package graft.streaming

import graft.operators.Dq
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous data-quality verification — the streaming face of
  * [[Dq]]: each micro-batch folds to its 1-row distributive metric
  * state ([[Dq.metricState]] — raw count sums) appended to a state
  * table, and verdicts are read AT ANY TIME by merging the accumulated
  * states ([[Dq.mergeStates]] is plain addition, so batch boundaries
  * and arrival order are invisible — the [[StreamingHll]] idempotent-
  * merge principle, in counting form). The stream never holds state in
  * the engine: no state store, no watermark; the appended table IS the
  * state, and a replayed batch appends a duplicate row — callers
  * needing exactly-once wrap the append with the
  * [[graft.sources.PostingsStore]] batch-marker pattern.
  *
  * Only the distributive checks stream (completeness, range, volume);
  * uniqueness and referential integrity need unbounded key state and
  * stay with the nightly batch verifier ([[Dq.suite]]).
  */
object StreamingDq {

  /** Attach to a doc stream; per micro-batch, append the metric state
    * row to `statePath` (parquet).
    */
  def attach(stream: DataFrame, statePath: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dq.metricState(batch).write.mode("append").parquet(statePath)
      }
      .start()

  /** Current verdicts off the accumulated state table. */
  def verdicts(spark: SparkSession, statePath: String): DataFrame =
    Dq.verdictsFromState(Dq.mergeStates(spark.read.parquet(statePath)))
}
