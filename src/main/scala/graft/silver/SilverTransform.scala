package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bronze → Silver flatten/clean/enrich — the reference's core transform
  * (`Silver_layer/Silver_tranformation.py:76-114`), re-expressed as one
  * lazy Catalyst plan: Generate(explode) → Project → fillna → conditional
  * enrichment. Grain: shipment × checkpoint (~2–6× fan-out).
  *
  * Deviations from the reference, both deliberate (SURVEY §7.5):
  *  - `loadTimestamp` is injectable instead of `current_timestamp()` so
  *    runs are reproducible and golden-testable;
  *  - inner `explode` drops shipments with empty/null checkpoint arrays,
  *    matching the reference's observable behavior (its generator always
  *    emits ≥2); `explodeOuter = true` keeps them with null checkpoint
  *    fields for pipelines that must not lose shipments.
  */
object SilverTransform {

  val FillDefaults: Map[String, String] = Map(
    "status" -> "UNKNOWN",
    "checkpoint_city" -> "UNKNOWN",
    "checkpoint_country" -> "UNKNOWN")

  val SuccessStatuses: Seq[String] = Seq("DELIVERED", "OUTFORDELIVERY")

  def transform(
      bronze: DataFrame,
      loadDate: String,
      loadTimestamp: java.sql.Timestamp,
      explodeOuter: Boolean = false): DataFrame = {
    val cp = if (explodeOuter) explode_outer(col("checkpoints")) else explode(col("checkpoints"))
    bronze
      .withColumn("checkpoint", cp)
      .select(
        col("id").as("shipment_id"),
        col("tracking_number"),
        trim(upper(col("slug"))).as("courier"),
        trim(upper(col("tag"))).as("status"),
        col("origin_country_iso3").as("origin_country"),
        col("destination_country_iso3").as("destination_country"),
        col("customer_name"),
        col("shipment_weight_kg").cast("double").as("shipment_weight"),
        col("delivery_days").cast("int").as("delivery_days"),
        to_timestamp(col("created_at")).as("created_at"),
        to_timestamp(col("updated_at")).as("updated_at"),
        col("checkpoint.city").as("checkpoint_city"),
        col("checkpoint.country").as("checkpoint_country"),
        col("checkpoint.message").as("checkpoint_message"),
        to_timestamp(col("checkpoint.checkpoint_time")).as("checkpoint_time"))
      .na.fill(FillDefaults)
      .withColumn("delivery_status",
        when(col("status").isin(SuccessStatuses: _*), lit("SUCCESS")).otherwise(lit("PENDING")))
      .withColumn("load_date", lit(loadDate))
      .withColumn("load_timestamp", lit(loadTimestamp))
  }
}
