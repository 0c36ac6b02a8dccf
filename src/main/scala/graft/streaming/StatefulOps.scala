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
  /** Per-key state: the still-open session fragments, ascending by start,
    * pairwise farther than the gap apart. A fragment is a session that
    * more (late-but-within-watermark) events may yet extend or bridge. */
  final case class SessionFrags(frags: List[OpenSession])

  private def closeSession(userId: Long, s: OpenSession): SessionOut =
    SessionOut(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
      s.n, s.total)

  private def sessionize(gapMs: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionFrags]): Iterator[SessionOut] = {
    // One uniform step for both the data and the timeout invocation:
    // fold prior fragments with this batch's events (each a 1-event
    // fragment) via an interval merge — two fragments within `gap` fuse
    // (their aggregates are mergeable: min/max/sum). This is
    // arrival-order-independent: a late event may extend a fragment's
    // START, open a new earlier fragment, or BRIDGE two existing ones —
    // exactly what the batch operator's global sort produces.
    val wm = state.getCurrentWatermarkMs()
    val prior = state.getOption.map(_.frags).getOrElse(Nil)
    val incoming = events.map(e => OpenSession(e.ts.getTime, e.ts.getTime, 1L, e.value))
    val all = (prior ++ incoming).sortBy(f => (f.start, f.end))
    val merged = List.newBuilder[OpenSession]
    var cur: OpenSession = null
    all.foreach { f =>
      if (cur == null) cur = f
      else if (f.start - cur.end <= gapMs)
        cur = OpenSession(cur.start, math.max(cur.end, f.end), cur.n + f.n, cur.total + f.total)
      else { merged += cur; cur = f }
    }
    if (cur != null) merged += cur
    // a fragment is provably closed only once the watermark passes
    // end + gap: any event that could still extend or bridge it would
    // have ts ≤ end + gap < watermark, i.e. Spark already drops it
    val (closed, open) = merged.result().partition(_.end + gapMs < wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessionFrags(open))
      state.setTimeoutTimestamp(math.max(open.map(_.end).min + gapMs, wm + 1))
    }
    closed.map(closeSession(userId, _)).iterator
  }

  /** Gap-based streaming sessionization — the incremental counterpart of
    * [[graft.operators.Sessionize]] (same semantics: a session extends
    * while consecutive events arrive within `gap`). Equivalence with the
    * batch operator holds for ANY arrival order within the watermark:
    * state keeps open session *fragments*, and a late event can extend a
    * fragment backward, start an earlier one, or bridge two into one. A
    * session is emitted exactly when the watermark passes its end + gap
    * (the event-time timeout) — the moment it is provably closed — and
    * its state is freed then, so state size tracks open fragments only,
    * never history. Built on `flatMapGroupsWithState` because one
    * invocation can close several sessions for a key. */
  def sessionizeStream(events: Dataset[SessionEvent], gap: java.time.Duration,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessionFrags]
    implicit val outEnc = Encoders.product[SessionOut]
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sessionize(gap.toMillis))
  }
}

/** Custom streaming state via `transformWithState` (Spark 4's successor
  * to mapGroupsWithState — SURVEY §2.10): multiple NAMED state variables
  * per key (here a ValueState of running totals plus a ListState of the
  * top purchases), TTL per state variable, timers, and schema evolution,
  * all over the RocksDB state store (the API requires it — which is also
  * the provider the 300× stream-join decade showed halves GC at
  * 10M+-row state; see SURVEY §8.-9).
  *
  * The processor keeps, per user: (1) event count + running sum held as
  * an EXACT decimal string — replaying `Num.dsum`'s
  * cast-to-DECIMAL(30,6)-then-sum grid, so the emitted double equals the
  * batch aggregate bit for bit regardless of arrival order; (2) the top-3
  * purchase values ordered (value desc, event_id asc) in a ListState —
  * arrival-order-invariant by the total order. Each batch emits an
  * updated snapshot per touched user (Update mode); snapshots are
  * cumulative, so the final state per user is the one with the highest
  * n_events.
  */
/** `transformWithState` with MAP state (§2.10 — the third of the
  * arbitrary-state primitives, after [[SpendProfile]]'s ValueState +
  * ListState): per-user per-event-type counts and exact dsum-grid sums
  * held in ONE MapState[event_type → stats] rather than a state
  * variable per type — the shape for open-ended key sub-domains
  * (event taxonomies, product ids) where per-key ValueStates can't be
  * declared up front. Emitted as FIXED scalar columns per known type
  * (absent type → count 0 / sum null, matching SQL's empty-group
  * aggregate), so the snapshot is driver-comparator-gateable (the p21
  * scalars-only convention). Snapshots are cumulative (Update mode);
  * the final per-user profile is the max-total_n one. TTL is
  * deliberately NOT gated: TTLConfig evicts by PROCESSING time — wall
  * clock — which no batch oracle can replay; eviction semantics are
  * covered by the event-time mapGroupsWithState tests instead. */
object TypeProfile {
  final case class TypeStats(n: Long, sum_str: String)
  final case class EventTyped(user_id: Long, event_id: Long,
      event_type: String, value: Double, ts: java.sql.Timestamp)
  final case class UserTypes(user_id: Long, total_n: Long,
      click_n: Long, click_sum: Option[Double],
      view_n: Long, view_sum: Option[Double],
      purchase_n: Long, purchase_sum: Option[Double],
      signup_n: Long, signup_sum: Option[Double],
      error_n: Long, error_sum: Option[Double])

  /** The fixed taxonomy the SNAPSHOT projects; the MapState itself is
    * taxonomy-free (any new type accumulates — only the gated
    * projection names columns). */
  val KnownTypes: Seq[String] = Seq("click", "view", "purchase", "signup", "error")

  final class Processor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventTyped, UserTypes] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode}

    @transient private var byType: MapState[String, TypeStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      byType = getHandle.getMapState[String, TypeStats]("byType",
        Encoders.STRING, Encoders.product[TypeStats], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[EventTyped],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTypes] = {
      rows.foreach { e =>
        val prev =
          if (byType.containsKey(e.event_type)) byType.getValue(e.event_type)
          else TypeStats(0L, "0.000000")
        // the dsum grid: summands snapped to DECIMAL(30,6), summed exactly
        val acc = BigDecimal(prev.sum_str) +
          BigDecimal(e.value).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        byType.updateValue(e.event_type,
          TypeStats(prev.n + 1, acc.bigDecimal.toPlainString))
      }
      val m = byType.iterator().map { case (t, s) => t -> s }.toMap
      def n(t: String): Long = m.get(t).map(_.n).getOrElse(0L)
      def s(t: String): Option[Double] =
        m.get(t).map(ts => BigDecimal(ts.sum_str).toDouble)
      Iterator.single(UserTypes(key, m.values.map(_.n).sum,
        n("click"), s("click"), n("view"), s("view"),
        n("purchase"), s("purchase"), n("signup"), s("signup"),
        n("error"), s("error")))
    }
  }

  /** Per-user per-type profile as a streaming MapState machine. */
  def userTypeProfile(events: Dataset[EventTyped]): Dataset[UserTypes] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Update())(Encoders.product[UserTypes])
  }
}

object SpendProfile {
  final case class SpendTotals(n_events: Long, sum_str: String)
  final case class TopEntry(value: Double, event_id: Long)
  final case class UserSpend(user_id: Long, n_events: Long,
      sum_value: Double, top3: Array[Double])

  final class Processor(topN: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, StatefulOps.EventIn, UserSpend] {
    import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimeMode, ValueState}

    @transient private var totals: ValueState[SpendTotals] = _
    @transient private var top: ListState[TopEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[SpendTotals]("totals",
        Encoders.product[SpendTotals], TTLConfig.NONE)
      top = getHandle.getListState[TopEntry]("top",
        Encoders.product[TopEntry], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[StatefulOps.EventIn],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserSpend] = {
      val prev =
        if (totals.exists()) totals.get()
        else SpendTotals(0L, "0.000000")
      var n = prev.n_events
      // the dsum grid: each summand snapped to DECIMAL(30,6) (HALF_UP,
      // Spark's double→decimal cast), summed exactly
      var acc = BigDecimal(prev.sum_str)
      var entries = if (top.exists()) top.get().toList else Nil
      rows.foreach { e =>
        n += 1
        acc += BigDecimal(e.value).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        entries = TopEntry(e.value, e.event_id) :: entries
      }
      val kept = entries
        .sortBy(t => (-t.value, t.event_id))
        .take(topN)
      totals.update(SpendTotals(n, acc.bigDecimal.toPlainString))
      top.put(kept.toArray)
      Iterator.single(UserSpend(key, n, acc.toDouble, kept.map(_.value).toArray))
    }
  }

  /** Per-user purchase profile as a streaming state machine. Each
    * micro-batch emits the cumulative snapshot for users it touched;
    * the final profile per user is the max-n_events snapshot. */
  def userSpendProfile(events: Dataset[StatefulOps.EventIn],
      topN: Int = 3): Dataset[UserSpend] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor(topN), TimeMode.None(),
        OutputMode.Update())(Encoders.product[UserSpend])
  }
}
