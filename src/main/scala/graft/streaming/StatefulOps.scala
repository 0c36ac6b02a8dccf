package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  // ---- streaming sessionization (flatMapGroupsWithState) -----------------

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)
  final case class OpenSession(start: Long, end: Long, n: Long, total: Double)

  private def closeSession(userId: Long, s: OpenSession): SessionOut =
    SessionOut(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
      s.n, s.total)

  private def sessionize(gapMs: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      // watermark passed session_end + gap: no event can extend this
      // session any more — emit it closed and free the state
      val out = closeSession(userId, state.get)
      state.remove()
      Iterator.single(out)
    } else {
      val sorted = events.toArray.sortBy(_.ts.getTime)
      val closed = Vector.newBuilder[SessionOut]
      var open = state.getOption.orNull
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case null => open = OpenSession(t, t, 1L, e.value)
          case s if t - s.end > gapMs =>
            closed += closeSession(userId, s)
            open = OpenSession(t, t, 1L, e.value)
          case s =>
            open = OpenSession(s.start, math.max(s.end, t), s.n + 1, s.total + e.value)
        }
      }
      // open can only be null on an empty invocation with no prior state
      // (not expected from Spark, but guard rather than NPE the stream)
      if (open != null) {
        state.update(open)
        state.setTimeoutTimestamp(
          math.max(open.end + gapMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.result().iterator
    }
  }

  /** Gap-based streaming sessionization — the incremental counterpart of
    * [[graft.operators.Sessionize]] (same semantics: a session extends
    * while consecutive events arrive within `gap`). Closed sessions are
    * emitted as soon as they're provably closed: either a same-key event
    * arrives beyond the gap, or the watermark passes session_end + gap
    * (the event-time timeout) — which is also when the state is freed,
    * so state size tracks OPEN sessions only, never history. Built on
    * `flatMapGroupsWithState` because one input batch can close several
    * sessions for a key (0..n outputs per invocation). */
  def sessionizeStream(events: Dataset[SessionEvent], gap: java.time.Duration,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sessionize(gap.toMillis))
  }
}
