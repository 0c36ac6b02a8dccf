package graft.serve

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Serving-side sinks and artifact discovery (SURVEY §2 S9/S11/O1).
  *
  * The reference logs each prediction by serializing a 1-row CSV to the
  * object store (`API/pastapi.py:146-163`) and resolves "the latest
  * model" by lexicographic sort of folder names (`pastapi.py:76`). Here:
  * append-mode parquet (typed, partition-friendly, no read-modify-write)
  * and filesystem-API listing.
  */
object PredictionLog {

  /** Appends prediction rows to a date-partitioned log. Appends within
    * this JVM are serialized: concurrent append JOBS to one path share
    * the `_temporary` staging dir, and one job's commit-cleanup can
    * delete another's in-flight files (the classic FileOutputCommitter
    * hazard) — a lock is the right price for a low-rate serving log.
    * Cross-process concurrent appends need a committer that stages
    * per-job (object-store committers), or the streaming
    * [[graft.streaming.SilverStream.appendSink]] path. */
  def append(log: DataFrame, dir: String): Unit = appendLock.synchronized {
    log.write.mode(SaveMode.Append).partitionBy("log_date").parquet(dir)
  }
  private val appendLock = new Object

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Latest dated subdirectory (lexicographic ISO dates sort temporally)
    * — the model-artifact resolution shape from `pastapi.py:62-91`. */
  def latestRun(spark: SparkSession, root: String): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).filter(_.isDirectory).map(_.getPath.getName)
      .sorted(Ordering[String].reverse).headOption
  }

  /** Warehouse export via JDBC (SURVEY §2 S7). Thin by design: typed DDL
    * comes from the DataFrame schema instead of the reference's
    * all-STRING tables (`snowflake_connection.py:97-101`). Round-tripped
    * in tests against embedded Derby (PredictionLogSpec) — the same
    * write path a real warehouse URL exercises. */
  def exportJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
}
