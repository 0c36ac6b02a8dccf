package graft

import org.apache.spark.sql.functions._

import graft.gen.BronzeGenerator
import graft.model.Schemas

/** Generator invariants: determinism independent of partitioning, value
  * ranges matching the reference distributions (extraction.py:65-111). */
class GeneratorSpec extends SparkTestBase {
  import spark.implicits._

  test("bit-stable across partitionings and runs") {
    val a = BronzeGenerator.shipments(spark, 500, 42L, "2024-01-01")
    val b = BronzeGenerator.shipments(spark, 500, 42L, "2024-01-01").repartition(13)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val c = BronzeGenerator.shipments(spark, 500, 43L, "2024-01-01")
    assert(a.exceptAll(c).count() > 0, "different seed → different data")
  }

  test("distributions match the reference ranges") {
    val df = BronzeGenerator.shipments(spark, 2000, 42L, "2024-01-01").cache()
    val cp = df.select(size(col("checkpoints")).as("k"))
      .agg(min("k"), max("k")).as[(Int, Int)].head()
    assert(cp._1 >= 2 && cp._2 <= 6, s"checkpoints 2..6, got $cp")
    val w = df.agg(min("shipment_weight_kg"), max("shipment_weight_kg")).as[(Double, Double)].head()
    assert(w._1 >= 0.1 && w._2 <= 15.0, s"weight 0.1..15, got $w")
    val d = df.agg(min("delivery_days"), max("delivery_days")).as[(Int, Int)].head()
    assert(d._1 >= 0 && d._2 <= 3, s"delivery days 0..3, got $d")
    val couriers = df.select("slug").distinct().as[String].collect().toSet
    assert(couriers.subsetOf(Schemas.Couriers.toSet))
    assert(df.select("tracking_number").distinct().count() === 2000)
    df.unpersist()
  }
}
