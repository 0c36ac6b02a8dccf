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

  /** The merged frame plus its key-level counts; `cached` is the
    * updates-side cache to release once `merged` has been written. */
  private[io] final case class MergePlan(
      merged: DataFrame, cached: DataFrame,
      before: Long, matchedKeys: Long, updateKeys: Long)

  /** Builds the MERGE frame shared by [[upsertParquet]] (in-place swap)
    * and [[VersionedTable.upsert]] (new published version). */
  private[io] def mergePlan(target: DataFrame, updates: DataFrame, key: String): MergePlan = {
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
    MergePlan(merged, u, target.count(), matchedKeys, nUpdateKeys)
  }

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
    val plan = mergePlan(target, updates, key)
    swapInto(spark, targetDir, plan.merged, suffix = "_merging")
    plan.cached.unpersist()
    val after = spark.read.parquet(targetDir).count()
    (plan.before, after, plan.matchedKeys, plan.updateKeys - plan.matchedKeys)
  }

  /** Conditional MERGE, last-writer-wins (the CDC-apply flavor of
    * `MERGE INTO ... WHEN MATCHED AND source.ts > target.ts`): the
    * target keeps, per key, the single row winning the `ordCols`
    * ordering across target ∪ updates — so replaying stale changes can
    * never regress a newer row, and applying the same batch twice is a
    * no-op (idempotent upsert). `ordCols` must totally order rows
    * within a key (end with a unique column, e.g. the event id);
    * that's also what makes the final state independent of HOW changes
    * were batched: per-key argmax is associative and commutative, so
    * any batching of the same change set converges to the same table —
    * the property the p15 stream≡batch gate checks.
    *
    * One shuffle on the key per apply; the rewrite is copy-on-write via
    * the same atomic temp+rename as [[upsertParquet]]. A missing target
    * bootstraps from the updates alone (first micro-batch). */
  def lwwUpsertParquet(spark: SparkSession, targetDir: String,
      updates: DataFrame, key: String, ordCols: Seq[String]): Unit = {
    require(ordCols.nonEmpty, "lww merge needs at least one ordering column")
    val path = new org.apache.hadoop.fs.Path(targetDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(path)
    val combined =
      if (exists) {
        val target = spark.read.parquet(targetDir)
        require(target.columns.toSet == updates.columns.toSet,
          s"schema mismatch: ${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
        target.unionByName(updates.select(target.columns.map(col): _*))
      } else updates
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(ordCols.map(col(_).desc): _*)
    val merged = combined
      .withColumn("_lww_rn", row_number().over(w))
      .filter(col("_lww_rn") === 1).drop("_lww_rn")
    if (exists) swapInto(spark, targetDir, merged, suffix = "_lww")
    else {
      // bootstrap through the same temp+rename: a crash mid-write must
      // leave targetDir ABSENT (so the replayed epoch bootstraps again),
      // never half-committed (which would wedge every later read)
      val tmp = new org.apache.hadoop.fs.Path(targetDir + "_lww")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      require(fs.rename(tmp, path),
        s"bootstrap failed: could not move $tmp into place")
    }
  }

  /** Writes `df` to a temp sibling then swaps it into `dir`, checking
    * every filesystem step. Stale temp/backup dirs from a crashed prior
    * run are cleaned first — otherwise their presence makes rename
    * silently fail and the swap becomes a data-losing no-op.
    *
    * The two renames leave a small window where `dir` does not exist; a
    * concurrent reader planning a scan right then fails. Single-writer
    * single-reader pipelines tolerate that; for always-readable tables
    * use [[VersionedTable]], whose marker-file commit has no gap. */
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
