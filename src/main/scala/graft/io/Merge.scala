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

  /** Returns (rowsBefore, rowsAfter, updated, inserted). */
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
    val nUpdates = u.count()
    val matched = target.join(u.select(col(key)), Seq(key), "left_semi").count()

    val merged = target.join(u.select(col(key).as("_uk")), col(key) === col("_uk"), "left_anti")
      .unionByName(u)
    val before = target.count()

    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(targetDir)
    val fs = path.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(targetDir + "_merging")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(targetDir + "_old")
    fs.rename(path, bak)
    fs.rename(tmp, path)
    fs.delete(bak, true)
    u.unpersist()
    val after = spark.read.parquet(targetDir).count()
    (before, after, matched, nUpdates - matched)
  }
}
