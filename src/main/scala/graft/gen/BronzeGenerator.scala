package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Deterministic distributed synthetic shipment generator — the engine's
  * version of the reference's faker script (`Bronze_layer/extraction.py:
  * 65-111,142-150`: 50–90k shipments/day, 2–6 checkpoints each, seed 42).
  *
  * Differences by design:
  *  - runs *on the cluster* (`spark.range(n)` + column expressions), so
  *    generating a 100 TB test corpus is a parallel job, not a driver loop;
  *  - deterministic per (seed, row id) via hash-derived uniforms —
  *    independent of partitioning, unlike `rand(seed)` whose draw order
  *    depends on the split layout.
  */
object BronzeGenerator {

  val CountryCodes: Seq[String] = Seq("USA", "DEU", "FRA", "BRA", "IND",
    "CHN", "GBR", "JPN", "CAN", "AUS", "MEX", "ESP")

  /** Uniform in [0,1) derived from (seed, id, salt) — stable across any
    * partitioning. */
  private def u(seed: Long, salt: Int): Column =
    pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(1000000L)).cast("double") / 1000000.0

  private def pick(seed: Long, salt: Int, choices: Seq[String]): Column =
    element_at(
      array(choices.map(lit(_)): _*),
      (u(seed, salt) * choices.size).cast("int") + 1)

  private def sqlList(xs: Seq[String]): String = xs.map(x => s"'$x'").mkString(",")

  /** `n` bronze shipment records for a load date, bit-stable for a given
    * seed. Matches the reference's distributions: weight 0.1–15.0 kg,
    * delivery 1–72 h (0–3 days), 2–6 checkpoints spaced 3 h apart. */
  def shipments(spark: SparkSession, n: Long, seed: Long, loadDate: String): DataFrame =
    spark.range(n)
      .withColumn("created_ts",
        to_timestamp(lit(s"$loadDate 00:00:00")) +
          expr(s"make_interval(0, 0, 0, 0, cast(pmod(xxhash64(id, $seed, 7), 24) as int), 0, 0)"))
      .withColumn("delivery_hours", (u(seed, 5) * 72).cast("int") + 1)
      .withColumn("updated_ts",
        col("created_ts") + expr("make_interval(0, 0, 0, 0, delivery_hours, 0, 0)"))
      .withColumn("n_checkpoints", (u(seed, 6) * 5).cast("int") + 2)
      .select(
        concat(lit("SHP-"), lpad(abs(xxhash64(col("id"), lit(seed))).cast("string"), 19, "0")).as("id"),
        concat(lit("TN"), lpad(col("id").cast("string"), 10, "0")).as("tracking_number"),
        pick(seed, 1, Schemas.Couriers).as("slug"),
        pick(seed, 2, Schemas.Statuses).as("tag"),
        date_format(col("created_ts"), "yyyy-MM-dd HH:mm:ss").as("created_at"),
        date_format(col("updated_ts"), "yyyy-MM-dd HH:mm:ss").as("updated_at"),
        pick(seed, 8, CountryCodes).as("origin_country_iso3"),
        pick(seed, 9, CountryCodes).as("destination_country_iso3"),
        concat(lit("Customer "), col("id").cast("string")).as("customer_name"),
        round(u(seed, 4) * 14.9 + 0.1, 2).as("shipment_weight_kg"),
        floor(col("delivery_hours") / 24).cast("int").as("delivery_days"),
        expr(
          s"""transform(sequence(0, n_checkpoints - 1), j -> named_struct(
             |  'message', element_at(array(${sqlList(Schemas.CheckpointMessages)}), cast(j % ${Schemas.CheckpointMessages.size} as int) + 1),
             |  'city', concat('City_', cast(pmod(xxhash64(id, j, $seed), 50) as string)),
             |  'country', element_at(array(${sqlList(CountryCodes)}), cast(pmod(xxhash64(id, j, ${seed + 1}), ${CountryCodes.size}) as int) + 1),
             |  'checkpoint_time', date_format(created_ts + make_interval(0, 0, 0, 0, 3 * cast(j as int), 0, 0), 'yyyy-MM-dd HH:mm:ss'),
             |  'tag', element_at(array(${sqlList(Schemas.Statuses)}), cast(pmod(xxhash64(id, j, ${seed + 2}), ${Schemas.Statuses.size}) as int) + 1)))""".stripMargin)
          .as("checkpoints"))
}
