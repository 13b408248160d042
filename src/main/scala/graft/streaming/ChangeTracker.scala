package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed cross-batch change detection as a real stateful streaming operator
  * (`flatMapGroupsWithState`) — the Structured-Streaming-native upgrade of
  * A2's previous-poll diff (OmmCancellationHandler.java:206–226, which kept
  * an in-memory list and could only count; state here is per-key, bounded,
  * checkpointable, and emits the actual transitions).
  *
  * Input: one row per (poll, trip) — e.g. the deduped pipeline output with a
  * poll timestamp. Output: only CHANGES — a trip appearing (`new`), changing
  * status (`changed`), or re-appearing identically (`repeat`, suppressed by
  * default). Downstream gets an idempotent keyed change stream instead of
  * full snapshots.
  *
  * At scale: state is one small record per active trip (the reference's own
  * invariant — "always 1 or 0 active cancellations per trip", Hand:171), so
  * the state store stays dimension-sized no matter how many polls flow
  * through. Processing-time timeout expires trips not seen for `ttlMs`
  * (cancellations stop being emitted once out of the snapshot window).
  */
object ChangeTracker {

  case class TripUpdate(trip_id: String, status: String, event_ts_ms: Long)
  case class TripState(status: String, event_ts_ms: Long)
  case class TripChange(trip_id: String, change: String,
                        status: String, prev_status: String)

  /** `ttlMs <= 0` disables state expiry (NoTimeout). Note that with a
    * processing-time timeout the engine schedules timeout-evaluation
    * batches continuously — `processAllAvailable()` never settles, so
    * tests and bounded drains should run with the TTL off. */
  def track(updates: Dataset[TripUpdate], ttlMs: Long = 3600000L,
            emitRepeats: Boolean = false): Dataset[TripChange] = {
    implicit val changeEnc = Encoders.product[TripChange]
    implicit val stateEnc = Encoders.product[TripState]
    import updates.sparkSession.implicits._

    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    updates.groupByKey(_.trip_id)
      .flatMapGroupsWithState[TripState, TripChange](
        OutputMode.Append(), timeout) {
        (tripId: String, rows: Iterator[TripUpdate], state: GroupState[TripState]) =>
          if (state.hasTimedOut) {
            val prev = state.get
            state.remove()
            Iterator(TripChange(tripId, "expired", null, prev.status))
          } else {
            // within a batch, keep the latest update per trip
            val latest = rows.maxBy(_.event_ts_ms)
            val out = state.getOption match {
              case None =>
                Iterator(TripChange(tripId, "new", latest.status, null))
              case Some(prev) if prev.status != latest.status =>
                Iterator(TripChange(tripId, "changed", latest.status, prev.status))
              case Some(prev) if emitRepeats =>
                Iterator(TripChange(tripId, "repeat", latest.status, prev.status))
              case _ => Iterator.empty
            }
            state.update(TripState(latest.status, latest.event_ts_ms))
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out
          }
      }
  }
}
