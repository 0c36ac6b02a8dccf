package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Layer storage helpers: bucketed tables for co-located joins.
  *
  * Bucketing pre-shuffles a table by its join key at write time; two
  * tables bucketed the same way join with NO Exchange at read time —
  * at 100 TB this converts every fact⋈fact join on the bucket key from
  * a full-network shuffle into a local zip of bucket files. The cost is
  * paid once per write instead of once per query.
  */
object LayerIO {

  /** Writes `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
