package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate: rules are named Column predicates; rows
  * failing any rule route to a quarantine frame with the list of violated
  * rules attached, clean rows pass through unchanged.
  *
  * The reference's "quality handling" is try/except-continue around whole
  * files (`Silver_tranformation.py:61-65`) — a bad record silently drops
  * the entire day's batch. Row-level quarantine keeps the good rows and
  * makes the bad ones inspectable, and the split is a single pass (no
  * second scan for the complement).
  */
object DataQuality {

  final case class Split(clean: DataFrame, quarantine: DataFrame)

  /** @param rules name → predicate that must hold for a clean row */
  def check(df: DataFrame, rules: Map[String, Column]): Split = {
    // sorted by rule name so the violations array is deterministic — Map
    // iteration order is an implementation detail
    val violated = array_compact(array(rules.toSeq.sortBy(_._1).map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*))
    val flagged = df.withColumn("_violations", violated)
    Split(
      clean = flagged.filter(size(col("_violations")) === 0).drop("_violations"),
      quarantine = flagged.filter(size(col("_violations")) > 0)
        .withColumnRenamed("_violations", "violations"))
  }

  /** Standard silver-layer rules (SURVEY §5.2 invariants). */
  def silverRules: Map[String, Column] = Map(
    "tracking_number_present" -> (col("tracking_number").isNotNull && col("tracking_number") =!= ""),
    "created_at_parsed" -> col("created_at").isNotNull,
    "checkpoint_time_parsed" -> col("checkpoint_time").isNotNull,
    "weight_in_range" -> (col("shipment_weight") > 0.0 && col("shipment_weight") <= 1000.0),
    "delivery_days_nonnegative" -> (col("delivery_days") >= 0),
    "event_order_sane" -> (col("updated_at") >= col("created_at")))
}
