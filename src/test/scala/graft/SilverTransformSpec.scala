package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.gen.BronzeGenerator
import graft.silver.SilverTransform

/** SilverTransform semantics (SURVEY §5.2): explode fan-out, status
  * truth table, fillna defaults, empty-checkpoint edge. */
class SilverTransformSpec extends SparkTestBase {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def bronze(n: Long) = BronzeGenerator.shipments(spark, n, seed = 42L, "2024-01-01")

  test("explode fan-out: one silver row per checkpoint") {
    val b = bronze(200)
    val expected = b.select(sum(size(col("checkpoints")))).as[Long].head()
    val silver = SilverTransform.transform(b, "2024-01-01", ts)
    assert(silver.count() === expected)
  }

  test("delivery_status truth table from status") {
    val rows = Seq(
      ("Delivered", "SUCCESS"), ("OutForDelivery", "SUCCESS"),
      ("Pending", "PENDING"), ("Exception", "PENDING"),
      ("InTransit", "PENDING"), (null, "PENDING")) // null → fillna UNKNOWN → PENDING
    val b = rows.zipWithIndex.map { case ((tag, _), i) =>
      (s"id$i", s"TN$i", "dhl", tag, "2024-01-01 00:00:00", "2024-01-02 00:00:00",
        "USA", "DEU", "c", 1.0, 1,
        Seq(("msg", "city", "USA", "2024-01-01 03:00:00", "InTransit")))
    }.toDF("id", "tracking_number", "slug", "tag", "created_at", "updated_at",
      "origin_country_iso3", "destination_country_iso3", "customer_name",
      "shipment_weight_kg", "delivery_days", "checkpoints")
      .withColumn("checkpoints", col("checkpoints").cast(
        "array<struct<message:string,city:string,country:string,checkpoint_time:string,tag:string>>"))
    val silver = SilverTransform.transform(b, "2024-01-01", ts)
      .select("shipment_id", "delivery_status").as[(String, String)].collect().toMap
    rows.zipWithIndex.foreach { case ((_, want), i) =>
      assert(silver(s"id$i") === want, s"row $i")
    }
  }

  test("fillna: null status/city/country become UNKNOWN, others untouched") {
    val b = Seq(
      ("id0", "TN0", " dhl ", null.asInstanceOf[String], "2024-01-01 00:00:00",
        "2024-01-02 00:00:00", "USA", "DEU", "c", 1.0, 1,
        Seq((null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String],
          "2024-01-01 03:00:00", "Pending"))))
      .toDF("id", "tracking_number", "slug", "tag", "created_at", "updated_at",
        "origin_country_iso3", "destination_country_iso3", "customer_name",
        "shipment_weight_kg", "delivery_days", "checkpoints")
      .withColumn("checkpoints", col("checkpoints").cast(
        "array<struct<message:string,city:string,country:string,checkpoint_time:string,tag:string>>"))
    val r = SilverTransform.transform(b, "2024-01-01", ts).head()
    assert(r.getAs[String]("status") === "UNKNOWN")
    assert(r.getAs[String]("checkpoint_city") === "UNKNOWN")
    assert(r.getAs[String]("checkpoint_country") === "UNKNOWN")
    assert(r.getAs[String]("checkpoint_message") === null) // not in fill list
    assert(r.getAs[String]("courier") === "DHL") // trim + upper applied
  }

  test("empty checkpoints: inner explode drops, explode_outer keeps") {
    val b = Seq(
      ("id0", "TN0", "dhl", "Pending", "2024-01-01 00:00:00", "2024-01-02 00:00:00",
        "USA", "DEU", "c", 1.0, 1, Seq.empty[(String, String, String, String, String)]))
      .toDF("id", "tracking_number", "slug", "tag", "created_at", "updated_at",
        "origin_country_iso3", "destination_country_iso3", "customer_name",
        "shipment_weight_kg", "delivery_days", "checkpoints")
      .withColumn("checkpoints", col("checkpoints").cast(
        "array<struct<message:string,city:string,country:string,checkpoint_time:string,tag:string>>"))
    assert(SilverTransform.transform(b, "2024-01-01", ts).count() === 0)
    val outer = SilverTransform.transform(b, "2024-01-01", ts, explodeOuter = true)
    assert(outer.count() === 1)
    assert(outer.head().getAs[String]("checkpoint_city") === "UNKNOWN")
  }

  test("timestamp parsing: silver timestamps reproduce bronze ISO strings") {
    val b = bronze(50)
    val silver = SilverTransform.transform(b, "2024-01-01", ts)
    val mismatched = silver
      .withColumn("roundtrip", date_format(col("created_at"), "yyyy-MM-dd HH:mm:ss"))
      .join(b.select(col("id").as("shipment_id"), col("created_at").as("orig")), "shipment_id")
      .filter(col("roundtrip") =!= col("orig"))
    assert(mismatched.count() === 0)
  }
}
