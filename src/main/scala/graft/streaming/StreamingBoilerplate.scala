package graft.streaming

import java.sql.Timestamp

import graft.functions.TextSim
import graft.operators.Scrub
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A unit sighting on the document stream. */
case class UnitSeen(unit: String, doc_id: Long, ts: Timestamp)

/** A unit promoted to boilerplate (crossed the distinct-doc threshold).
  * `n_docs_at_promotion` is the distinct-doc count AT the moment the
  * threshold was crossed — a LOWER BOUND on the batch operator's total
  * `n_docs` for the same unit (the stream stops counting after
  * promotion; the batch pass sees every sighting). The name is
  * deliberately different from the batch output's `n_docs` so the two
  * can never be compared as equals by accident.
  */
case class BoilerHit(unit: String, n_docs_at_promotion: Long, ts: Timestamp)

/** Streaming boilerplate discovery — the continuous version of
  * `q_boilerplate`: a unit is emitted ONCE, the moment it has been
  * seen in `MinDocs` DISTINCT documents. Downstream a cleaning filter
  * subtracts the growing blocklist from arriving documents.
  *
  * State per unit is bounded by construction: the distinct doc-id set
  * is only tracked UP TO the threshold (after promotion the state
  * collapses to a tombstone), so a unit holds at most `MinDocs` ids —
  * O(threshold), not O(sightings); the viral-unit case costs the same
  * as the 2-doc case. Event-time TTL forgets units cold for
  * [[StateTtlMs]] — the same "exact within the horizon" contract as
  * [[StreamingDedup]]. Batch units builder ([[Scrub.units]]) is reused
  * verbatim on the stream — the signature expressions are engine-side,
  * not micro-batch-side.
  */
object StreamingBoilerplate {

  val StateTtlMs: Long = 24L * 3600 * 1000

  /** (promoted: kept doc-id set is replaced by None) */
  private type S = (Option[Set[Long]], Long)

  def update(minDocs: Int)(unit: String, seen: Iterator[UnitSeen],
    state: GroupState[S]): Iterator[BoilerHit] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val batch = seen.toSeq
    if (batch.isEmpty) return Iterator.empty
    val lastSeen = math.max(state.getOption.map(_._2).getOrElse(0L),
      batch.map(_.ts.getTime).max)
    val out = state.getOption.map(_._1) match {
      case Some(None) => // already promoted — tombstone, emit nothing
        state.update((None, lastSeen))
        Iterator.empty[BoilerHit]
      case prev =>
        val ids = prev.flatten.getOrElse(Set.empty[Long]) ++ batch.map(_.doc_id)
        if (ids.size >= minDocs) {
          state.update((None, lastSeen))
          Iterator.single(BoilerHit(unit, ids.size.toLong,
            new Timestamp(batch.map(_.ts.getTime).max)))
        } else {
          state.update((Some(ids), lastSeen))
          Iterator.empty[BoilerHit]
        }
    }
    state.setTimeoutTimestamp(lastSeen + StateTtlMs)
    out
  }

  /** Explode a `(doc_id, text, ts)` document stream into unit
    * sightings with the batch unit builder, then run the stateful
    * threshold. One shuffle on the unit key, exactly like the batch
    * operator's groupBy.
    */
  def boilerplate(docs: org.apache.spark.sql.DataFrame,
    minDocs: Int = Scrub.BoilerMinDocs,
    width: Int = Scrub.BoilerWidth): Dataset[BoilerHit] = {
    implicit val ue = Encoders.product[UnitSeen]
    implicit val be = Encoders.product[BoilerHit]
    implicit val ke = Encoders.STRING
    implicit val se = Encoders.kryo[S]
    docs
      .select(col("doc_id"), col("ts"),
        explode(Scrub.units(TextSim.tokens(col("text")), width)).as("unit"))
      .select(col("unit"), col("doc_id"), col("ts"))
      .as[UnitSeen]
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.unit)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(minDocs) _)
  }
}
