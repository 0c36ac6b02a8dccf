package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session while the gap stays under `gapSeconds`. The lag + running
  * sum formulation is one shuffle on the key and mirrors 1:1 into the
  * DuckDB oracle; the incremental counterpart is
  * [[graft.streaming.StatefulOps.sessionizeStream]], whose closed-session
  * output is asserted equal to this operator's in StreamingSpec.
  */
object Sessionize {

  /** Adds `session_id` (0-based per key, time order). */
  def withSessionIds(events: DataFrame, key: String, time: String,
      tieBreak: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(tieBreak))
    events
      .withColumn("_gap_us", unix_micros(col(time)) - lag(unix_micros(col(time)), 1).over(w))
      .withColumn("_new_session",
        when(col("_gap_us").isNull || col("_gap_us") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("_gap_us", "_new_session")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(events: DataFrame, key: String, time: String,
      tieBreak: String, gapSeconds: Long): DataFrame =
    withSessionIds(events, key, time, tieBreak, gapSeconds)
      .groupBy(col(key), col("session_id"))
      .agg(
        min(col(time)).as("session_start"),
        max(col(time)).as("session_end"),
        count(lit(1)).as("n_events"))
}
