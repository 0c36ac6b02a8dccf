package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the shared benchmark corpus (TESTDATA.md): one parquet file
  * per table under a scale-factor directory (`/root/testdata/sf*`).
  *
  * Reads are plain parquet scans so Catalyst's pushdown/pruning applies:
  * filters and projections written downstream reach the scan
  * (`PushedFilters`/`ReadSchema` in explain output). At cluster scale the
  * same API works over partitioned/bucketed table layouts — nothing here
  * assumes a single file.
  */
object Corpus {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark reads as long
    * (nanosAsLong, see [[graft.GraftSession]]); truncate to micros exactly
    * like DuckDB/Arrow do so both engines see identical timestamps. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(table(s, d, "events"))

  /** Applies the nanos→micros ts normalization to any events-shaped frame
    * (batch or streaming). */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
