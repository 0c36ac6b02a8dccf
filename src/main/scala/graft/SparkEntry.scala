package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All capability queries live as [[QuerySpec]]s in `graft.queries.*`,
  * aggregated by [[graft.queries.Registry]]; this object flattens them into
  * the maps the driver consumes. Query/oracle column names match by
  * construction (each spec carries both sides).
  */
object SparkEntry {
  private def allSpecs: Seq[QuerySpec] = _root_.graft.queries.Registry.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allSpecs.find(_.name == "q06_region_customer_stats").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(s => s.oracle.map(s.name -> _)).toMap
}
