package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Upsert (MERGE) into a parquet table — the Delta/Iceberg `MERGE INTO`
  * capability on plain parquet: updates win over target rows on the key,
  * inserts append, everything else carries over. Rewrite is atomic
  * (temp + rename, same as [[Maintenance.compactParquet]]).
  *
  * At scale this is the copy-on-write strategy: the whole table (or the
  * touched partitions, when a partition predicate is supplied) rewrites.
  * Merge-on-read (delta logs) trades that write cost for read-side merge
  * overhead — out of scope without a table format.
  */
object Merge {

  /** Returns (rowsBefore, rowsAfter, updatedKeys, insertedKeys).
    *
    * Key semantics: ALL target rows carrying an updated key are replaced
    * by ALL update rows with that key (grain of `updates` is preserved,
    * so a multi-row update key lands multi-row). Counts are key-level —
    * well-defined even when either side is non-unique on the key. */
  def upsertParquet(
      spark: SparkSession,
      targetDir: String,
      updates: DataFrame,
      key: String): (Long, Long, Long, Long) = {
    val target = spark.read.parquet(targetDir)
    require(target.columns.sameElements(updates.columns) ||
      target.columns.toSet == updates.columns.toSet,
      s"schema mismatch: ${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val u = updates.select(target.columns.map(col): _*).cache()
    val updateKeys = u.select(col(key)).distinct()
    val nUpdateKeys = updateKeys.count()
    val matchedKeys = target.select(col(key)).distinct()
      .join(updateKeys, Seq(key), "left_semi").count()

    val merged = target.join(u.select(col(key).as("_uk")), col(key) === col("_uk"), "left_anti")
      .unionByName(u)
    val before = target.count()

    swapInto(spark, targetDir, merged, suffix = "_merging")
    u.unpersist()
    val after = spark.read.parquet(targetDir).count()
    (before, after, matchedKeys, nUpdateKeys - matchedKeys)
  }

  /** Writes `df` to a temp sibling then atomically swaps it into `dir`,
    * checking every filesystem step. Stale temp/backup dirs from a
    * crashed prior run are cleaned first — otherwise their presence makes
    * rename silently fail and the swap becomes a data-losing no-op. */
  private[io] def swapInto(spark: SparkSession, dir: String,
      df: DataFrame, suffix: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(dir + suffix)
    val bak = new org.apache.hadoop.fs.Path(dir + "_old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(bak)) fs.delete(bak, true)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(path, bak), s"swap failed: could not move $path aside")
    require(fs.rename(tmp, path), s"swap failed: could not move $tmp into place")
    fs.delete(bak, true)
  }
}
