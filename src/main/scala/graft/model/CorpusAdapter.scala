package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Corpus

/** Maps the shared corpus into the shipment domain so the Silver/Gold
  * transforms run — and are oracle-checked — on driver-provided data:
  * orders become shipments, lineitems become checkpoints (nested via
  * collect_list, which the Silver explode then flattens back out), the
  * customer→nation→region chain supplies geography.
  *
  * The mapping is pure column arithmetic, so the DuckDB oracle can
  * reproduce the expected Silver output with a plain 5-table join — the
  * nest/flatten round trip is exactly what gets verified.
  */
object CorpusAdapter {

  /** Bronze-shaped nested shipments from the corpus. Orders without
    * lineitems would nest to empty arrays; inner-join semantics drop them
    * on both sides (matches Silver's inner explode).
    *
    * Timestamps are carried natively (the corpus stores timestamp[ms] and
    * [[graft.silver.SilverTransform]]'s `to_timestamp` is an identity on
    * timestamp inputs) — formatting 600k dates to strings just to reparse
    * them downstream doubled the hot-path CPU for nothing. The
    * string-parsing Silver path stays exercised by the JSON bronze
    * pipeline (p07 / StreamingSpec), where strings are the real input. */
  def bronzeShipments(spark: SparkSession, dir: String): DataFrame = {
    val orders = Corpus.orders(spark, dir)
    val customer = Corpus.customer(spark, dir)
    val nation = Corpus.nation(spark, dir)
    val region = Corpus.region(spark, dir)
    val lineitem = Corpus.lineitem(spark, dir)

    val checkpoints = lineitem
      .select(
        col("l_orderkey"),
        struct(
          concat(lit("EVT-"), col("l_returnflag"), col("l_linestatus")).as("message"),
          when(pmod(col("l_suppkey"), lit(100)) === 0, lit(null).cast("string"))
            .otherwise(concat(lit("CITY_"), pmod(col("l_suppkey"), lit(100)).cast("string"))).as("city"),
          col("l_returnflag").as("country"),
          col("l_shipdate").as("checkpoint_time"),
          when(col("l_linestatus") === "F", lit("Delivered")).otherwise(lit("InTransit")).as("tag"))
          .as("cp"))
      .groupBy(col("l_orderkey"))
      .agg(collect_list(col("cp")).as("checkpoints"))

    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .join(checkpoints, col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_orderkey").cast("string").as("id"),
        concat(lit("TN"), col("o_orderkey").cast("string")).as("tracking_number"),
        concat(lit(" "), col("o_orderpriority"), lit(" ")).as("slug"),
        when(col("o_orderstatus") === "F", lit("Delivered"))
          .when(col("o_orderstatus") === "O", lit("InTransit"))
          .otherwise(lit("Pending")).as("tag"),
        col("o_orderdate").as("created_at"),
        (col("o_orderdate") + expr("make_interval(0, 0, 0, cast(o_orderkey % 7 as int), 0, 0, 0)"))
          .as("updated_at"),
        col("r_name").as("origin_country_iso3"),
        col("n_name").as("destination_country_iso3"),
        col("c_name").as("customer_name"),
        (col("o_totalprice") / 10000.0).as("shipment_weight_kg"),
        pmod(col("o_orderkey"), lit(7)).cast("int").as("delivery_days"),
        col("checkpoints"))
  }

  /** Flat silver equivalent: the same output as
    * `SilverTransform.transform(bronzeShipments(...))` but joining
    * lineitem directly instead of nesting into checkpoint arrays and
    * exploding back. Semantically identical (verified by the shared
    * oracle); used by the aggregate/serving queries where the nest→explode
    * round trip adds a groupBy shuffle for nothing. p01 keeps the nested
    * path — that round trip is the thing it verifies. */
  def silverFlat(spark: SparkSession, dir: String, loadDate: String,
      loadTs: java.sql.Timestamp): DataFrame =
    Corpus.orders(spark, dir)
      .join(Corpus.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Corpus.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Corpus.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .join(Corpus.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(
        col("o_orderkey").cast("string").as("shipment_id"),
        concat(lit("TN"), col("o_orderkey").cast("string")).as("tracking_number"),
        upper(col("o_orderpriority")).as("courier"),
        upper(when(col("o_orderstatus") === "F", lit("Delivered"))
          .when(col("o_orderstatus") === "O", lit("InTransit"))
          .otherwise(lit("Pending"))).as("status"),
        col("r_name").as("origin_country"),
        col("n_name").as("destination_country"),
        col("c_name").as("customer_name"),
        (col("o_totalprice") / 10000.0).as("shipment_weight"),
        pmod(col("o_orderkey"), lit(7)).cast("int").as("delivery_days"),
        col("o_orderdate").as("created_at"),
        (col("o_orderdate") + expr("make_interval(0, 0, 0, cast(o_orderkey % 7 as int), 0, 0, 0)")).as("updated_at"),
        coalesce(
          when(pmod(col("l_suppkey"), lit(100)) === 0, lit(null).cast("string"))
            .otherwise(concat(lit("CITY_"), pmod(col("l_suppkey"), lit(100)).cast("string"))),
          lit("UNKNOWN")).as("checkpoint_city"),
        col("l_returnflag").as("checkpoint_country"),
        concat(lit("EVT-"), col("l_returnflag"), col("l_linestatus")).as("checkpoint_message"),
        col("l_shipdate").as("checkpoint_time"))
      .withColumn("delivery_status",
        when(col("status").isin("DELIVERED", "OUTFORDELIVERY"), lit("SUCCESS"))
          .otherwise(lit("PENDING")))
      .withColumn("load_date", lit(loadDate))
      .withColumn("load_timestamp", lit(loadTs))

  /** DuckDB mirror of bronzeShipments ∘ SilverTransform (flat join form),
    * parameterized by the fixed load stamp. */
  def silverOracleSql(loadDate: String, loadTs: String): String =
    s"""SELECT CAST(o_orderkey AS VARCHAR) AS shipment_id,
       |  'TN' || CAST(o_orderkey AS VARCHAR) AS tracking_number,
       |  UPPER(o_orderpriority) AS courier,
       |  UPPER(CASE o_orderstatus WHEN 'F' THEN 'Delivered' WHEN 'O' THEN 'InTransit' ELSE 'Pending' END) AS status,
       |  r_name AS origin_country,
       |  n_name AS destination_country,
       |  c_name AS customer_name,
       |  o_totalprice / 10000.0 AS shipment_weight,
       |  CAST(o_orderkey % 7 AS INT) AS delivery_days,
       |  o_orderdate AS created_at,
       |  o_orderdate + (o_orderkey % 7) * INTERVAL 1 DAY AS updated_at,
       |  COALESCE(CASE WHEN l_suppkey % 100 = 0 THEN NULL
       |                ELSE 'CITY_' || CAST(l_suppkey % 100 AS VARCHAR) END, 'UNKNOWN') AS checkpoint_city,
       |  l_returnflag AS checkpoint_country,
       |  'EVT-' || l_returnflag || l_linestatus AS checkpoint_message,
       |  l_shipdate AS checkpoint_time,
       |  CASE WHEN UPPER(CASE o_orderstatus WHEN 'F' THEN 'Delivered' WHEN 'O' THEN 'InTransit' ELSE 'Pending' END)
       |         IN ('DELIVERED', 'OUTFORDELIVERY') THEN 'SUCCESS' ELSE 'PENDING' END AS delivery_status,
       |  '$loadDate' AS load_date,
       |  TIMESTAMP '$loadTs' AS load_timestamp
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin
}
