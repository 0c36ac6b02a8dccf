package graft

import org.apache.spark.sql.functions._

import graft.gen.BronzeGenerator
import graft.gold.StarSchema
import graft.silver.SilverTransform

/** StarSchema semantics: hand-computed KPI values, dim key uniqueness,
  * surrogate-key stability across runs/partitionings (SURVEY §7.5). */
class StarSchemaSpec extends SparkTestBase {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  /** 6 rows, 2 couriers, hand-computable KPIs. */
  private def tinySilver = Seq(
    // courier, tracking, status, delivery_days
    ("DHL", "T1", "DELIVERED", 2),
    ("DHL", "T1", "INTRANSIT", 2),  // same shipment, 2nd checkpoint
    ("DHL", "T2", "DELIVERED", 4),
    ("UPS", "T3", "PENDING", 1),
    ("UPS", "T4", "DELIVERED", 3),
    ("UPS", "T4", "DELIVERED", 3))
    .toDF("courier", "tracking_number", "status", "delivery_days")
    .withColumn("checkpoint_city", lit("C"))
    .withColumn("checkpoint_country", lit("X"))
    .withColumn("created_at", lit(ts))

  test("courierMetrics: hand-computed values") {
    val m = StarSchema.courierMetrics(tinySilver)
      .orderBy("courier").collect()
    val dhl = m(0)
    assert(dhl.getAs[String]("courier") === "DHL")
    assert(dhl.getAs[Long]("total_shipments") === 2)     // T1, T2
    assert(dhl.getAs[Long]("delivered_shipments") === 2) // 2 DELIVERED rows
    assert(dhl.getAs[Double]("avg_delivery_days") === 2.67) // (2+2+4)/3
    assert(dhl.getAs[Double]("delivery_success_pct") === 100.0)
    val ups = m(1)
    assert(ups.getAs[Long]("total_shipments") === 2)     // T3, T4
    assert(ups.getAs[Long]("delivered_shipments") === 2) // 2 DELIVERED rows
    assert(ups.getAs[Double]("avg_delivery_days") === 2.33) // (1+3+3)/3
    assert(ups.getAs[Double]("delivery_success_pct") === 100.0)
  }

  test("dims are key-unique and stable across partitionings") {
    val b = BronzeGenerator.shipments(spark, 300, 42L, "2024-01-01")
    val silver = SilverTransform.transform(b, "2024-01-01", ts)
    val d1 = StarSchema.dimLocation(silver)
    assert(d1.count() === d1.select("location_id").distinct().count())
    // same dim built from a differently-partitioned silver → identical rows
    val d2 = StarSchema.dimLocation(silver.repartition(7))
    assert(d1.except(d2).count() === 0 && d2.except(d1).count() === 0)
  }

  test("fact grain is preserved (no dedup) and star is joinable") {
    val b = BronzeGenerator.shipments(spark, 100, 42L, "2024-01-01")
    val silver = SilverTransform.transform(b, "2024-01-01", ts)
    val fact = StarSchema.factShipment(silver)
    assert(fact.count() === silver.count())
    val dim = StarSchema.dimCourier(silver)
    // every fact row resolves its courier dim
    val unresolved = fact.join(broadcast(dim.select(col("courier_id"), col("courier").as("dim_courier"))),
      Seq("courier_id"), "left").filter(col("dim_courier").isNull)
    assert(unresolved.count() === 0)
  }
}
