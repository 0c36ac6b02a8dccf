package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for the shipment domain (SURVEY §1). The reference
  * infers schemas everywhere (JSON inference at
  * `Silver_layer/Silver_tranformation.py:62`, CSV header inference at
  * `Snowflake/snowflake_connection.py:79-82`); this engine declares them —
  * inference costs a full extra read of every file at 100 TB and silently
  * drifts types.
  */
object Schemas {

  /** One bronze shipment record (`Bronze_layer/extraction.py:96-109`;
    * checkpoint struct `:82-94`). Timestamps are ISO strings at this layer
    * — parsing is Silver's job, mirroring the reference. */
  val checkpoint: StructType = StructType(Seq(
    StructField("message", StringType),
    StructField("city", StringType),
    StructField("country", StringType),
    StructField("checkpoint_time", StringType),
    StructField("tag", StringType)))

  val bronzeShipment: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("tracking_number", StringType),
    StructField("slug", StringType),
    StructField("tag", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("origin_country_iso3", StringType),
    StructField("destination_country_iso3", StringType),
    StructField("customer_name", StringType),
    StructField("shipment_weight_kg", DoubleType),
    StructField("delivery_days", IntegerType),
    StructField("checkpoints", ArrayType(checkpoint))))

  /** Courier/status enums (`extraction.py:53-60`). */
  val Couriers: Seq[String] = Seq("dhl", "fedex", "ups", "usps", "amazon",
    "bluedart", "correios", "delhivery", "dpd", "royalmail")
  val Statuses: Seq[String] = Seq("Pending", "InfoReceived", "InTransit",
    "OutForDelivery", "Delivered", "Exception", "FailedAttempt")
  val CheckpointMessages: Seq[String] = Seq(
    "Shipment information received", "Departed facility", "Arrived at hub",
    "Out for delivery", "Delivered to recipient")

  /** Silver grain: shipment × checkpoint
    * (`Silver_layer/Silver_tranformation.py:79-113`). */
  final case class SilverShipmentEvent(
      shipment_id: String,
      tracking_number: String,
      courier: String,
      status: String,
      origin_country: String,
      destination_country: String,
      customer_name: String,
      shipment_weight: Double,
      delivery_days: Int,
      created_at: java.sql.Timestamp,
      updated_at: java.sql.Timestamp,
      checkpoint_city: String,
      checkpoint_country: String,
      checkpoint_message: String,
      checkpoint_time: java.sql.Timestamp,
      delivery_status: String,
      load_date: String)
}
