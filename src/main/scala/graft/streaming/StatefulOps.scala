package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom streaming state via `mapGroupsWithState` (SURVEY §2.10 — the
  * KeyValueGroupedDataset state API): per-user running aggregates that
  * survive across micro-batches, with event-time TTL eviction.
  * This is the escape hatch when built-in windowed aggregation can't
  * express the state machine (running totals, session carts, CDC merge).
  *
  * State is BOUNDED: every group arms an event-time timeout at
  * last-seen-event + ttl; once the watermark passes it, the group emits
  * a final snapshot and its state is removed. Without this, an unbounded
  * key domain (user ids at 100 TB) grows the state store forever — the
  * timeout is what lets the operator run indefinitely.
  */
object StatefulOps {

  final case class EventIn(user_id: Long, event_id: Long, value: Double,
      ts: java.sql.Timestamp)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double, max_event_id: Long)

  private def updateTotals(ttlMs: Long)(
      userId: Long,
      events: Iterator[EventIn],
      state: GroupState[UserTotals]): UserTotals = {
    if (state.hasTimedOut) {
      // watermark passed last-seen + ttl: emit the final snapshot and
      // EVICT — the group's memory is released; a later event for this
      // user starts a fresh accumulation
      val last = state.get
      state.remove()
      last
    } else {
      val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0, -1L))
      var maxTs = Long.MinValue
      val next = events.foldLeft(prev) { (acc, e) =>
        maxTs = math.max(maxTs, e.ts.getTime)
        UserTotals(userId, acc.n_events + 1, acc.total_value + e.value,
          math.max(acc.max_event_id, e.event_id))
      }
      state.update(next)
      // re-arm on every batch that touches the group; must stay above the
      // current watermark or Spark rejects the timestamp
      state.setTimeoutTimestamp(
        math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1))
      next
    }
  }

  /** Streaming per-user running totals with bounded state. Each
    * micro-batch emits the updated totals for users seen in that batch
    * (Update mode); a group idle past `ttl` (event time, measured by the
    * watermark) emits once more and is evicted.
    *
    * `watermarkDelay` is the lateness bound on the input; `ttl` is how
    * long an idle group's state survives beyond its last event. */
  def runningUserTotals(events: Dataset[EventIn],
      watermarkDelay: String = "10 minutes",
      ttl: java.time.Duration = java.time.Duration.ofMinutes(30)): Dataset[UserTotals] = {
    implicit val enc = Encoders.product[UserTotals]
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout())(
        updateTotals(ttl.toMillis))
  }
}
