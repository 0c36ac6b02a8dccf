package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver → Gold star schema (`Gold_layer/starschema.py:59-146`): four
  * dims, two facts, one KPI aggregate.
  *
  * Deliberate divergence (SURVEY §7.5): surrogate keys are
  * `xxhash64(natural key)` instead of `monotonically_increasing_id()` —
  * the reference's ids change with partition layout and run order, which
  * breaks reproducibility, incremental rebuilds, and any cross-run join.
  * Hash keys are stable, collision-checked at 64 bits, and computed
  * map-side (no coordination).
  *
  * Unlike the reference (whose facts keep only natural keys — SURVEY
  * §2.5), facts carry the surrogate keys too, making the star actually
  * joinable: `fact.join(broadcast(dim), "courier_id")`.
  */
object StarSchema {

  def dimCourier(silver: DataFrame): DataFrame =
    silver.select(col("courier")).distinct()
      .withColumn("courier_id", xxhash64(col("courier")))

  def dimLocation(silver: DataFrame): DataFrame =
    silver.select(col("checkpoint_city"), col("checkpoint_country")).distinct()
      .withColumn("location_id", xxhash64(col("checkpoint_city"), col("checkpoint_country")))

  def dimDate(silver: DataFrame): DataFrame =
    silver.select(to_date(col("created_at")).as("date")).distinct()
      .withColumn("date_id", xxhash64(col("date").cast("string")))

  def dimStatus(silver: DataFrame): DataFrame =
    silver.select(col("status")).distinct()
      .withColumn("status_id", xxhash64(col("status")))

  /** Grain preserved from the reference: shipment × checkpoint, NOT
    * deduped (`starschema.py:105-116`) — dedup is the consumer's choice
    * via dropDuplicates("tracking_number"). */
  def factShipment(silver: DataFrame): DataFrame =
    silver.select(
      col("tracking_number"), col("courier"), xxhash64(col("courier")).as("courier_id"),
      col("origin_country"), col("destination_country"),
      col("shipment_weight"), col("delivery_days"),
      col("status"), xxhash64(col("status")).as("status_id"),
      col("created_at"), col("updated_at"), col("delivery_status"))

  def factTrackingEvent(silver: DataFrame): DataFrame =
    silver.select(
      col("tracking_number"),
      col("checkpoint_city"), col("checkpoint_country"),
      xxhash64(col("checkpoint_city"), col("checkpoint_country")).as("location_id"),
      col("checkpoint_message"), col("checkpoint_time"),
      col("courier"), col("status"), col("updated_at"))

  /** Courier KPI aggregate (`starschema.py:137-146`): distinct shipments,
    * delivered count, avg delivery days, success pct. Integer sums are
    * exact, so the rounded doubles are deterministic cross-engine. */
  def courierMetrics(silver: DataFrame): DataFrame =
    silver
      .groupBy(col("courier"))
      .agg(
        countDistinct(col("tracking_number")).as("total_shipments"),
        count(when(col("status") === "DELIVERED", true)).as("delivered_shipments"),
        sum(col("delivery_days")).as("sum_days"),
        count(col("delivery_days")).as("n_days"))
      .select(
        col("courier"),
        col("total_shipments"),
        col("delivered_shipments"),
        round(col("sum_days").cast("double") / col("n_days"), 2).as("avg_delivery_days"),
        round(col("delivered_shipments").cast("double") / col("total_shipments") * 100, 2)
          .as("delivery_success_pct"))
}
