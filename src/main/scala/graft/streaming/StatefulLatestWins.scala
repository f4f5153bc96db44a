package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed change event for the stateful fold (fixed envelope — SURVEY §1.3:
  * case classes for the envelope, DataFrame for dynamic payloads).
  */
case class ChangeEvent(sfId: String, replayId: Long, changeType: String, data: String)

/** Current materialized row for a key, or absence after delete-through. */
case class KeyedState(sfId: String, replayId: Long, data: String)

/** Latest-wins as a true streaming-state operator —
  * `flatMapGroupsWithState` keyed on `sfId` keeping only the max-replay-ID
  * version (W1), with delete-through (S9) and processing-time TTL so state
  * stays bounded (SURVEY §7.4.4: the 72-h retention window maps to state
  * TTL; keys idle longer than retention are dropped and would be rebuilt by
  * a resync, mirroring T3).
  *
  * Emits the new current state for a key whenever it changes — a changelog
  * of the materialized table (Update mode). State per key is ONE row
  * regardless of event volume; duplicates and out-of-order deliveries
  * (at-least-once, T6) are neutralized by the replay-ID monotonicity check,
  * the same rule as `setup.md:542,772`.
  */
object StatefulLatestWins {

  /** @param ttl optional state retention (e.g. `Some("72 hours")`). With a
    *            TTL the engine schedules extra micro-batches to fire
    *            timeouts — right for continuous deployments, but it keeps
    *            the query busy even when idle, so bounded replays/tests
    *            should use `None` (NoTimeout).
    */
  def fold(events: Dataset[ChangeEvent],
           ttl: Option[String] = None): Dataset[KeyedState] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.sfId)
      .flatMapGroupsWithState[KeyedState, KeyedState](
        OutputMode.Update(), timeoutConf) {
        (sfId: String, batch: Iterator[ChangeEvent], state: GroupState[KeyedState]) =>
          if (state.hasTimedOut) {
            state.remove() // retention expiry (T3 analog)
            Iterator.empty
          } else {
            val current = state.getOption
            // keep the max-replayId event of this batch for the key
            var best: ChangeEvent = null
            batch.foreach { e =>
              if (best == null || e.replayId > best.replayId) best = e
            }
            val advanced = best != null &&
              current.forall(_.replayId < best.replayId)
            if (!advanced) Iterator.empty
            else {
              ttl.foreach(state.setTimeoutDuration)
              if (best.changeType == "DELETE") {
                // Keep a TOMBSTONE in state (null data) rather than removing
                // it: dropping state would also drop the per-key replay-ID
                // watermark, letting a redelivered older UPSERT in a later
                // micro-batch resurrect the deleted record. The reference's
                // rule — ignore events with replayId <= stored
                // (`setup.md:542`) — must survive the delete; TTL expiry
                // (retention, T3) is what eventually reclaims the key.
                state.update(KeyedState(sfId, best.replayId, null))
                // tombstone: emit with null data so sinks can delete through
                Iterator(KeyedState(sfId, best.replayId, null))
              } else {
                val next = KeyedState(sfId, best.replayId, best.data)
                state.update(next)
                Iterator(next)
              }
            }
          }
      }
  }
}
