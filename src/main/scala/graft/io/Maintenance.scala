package graft.io

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table maintenance: small-file compaction (the OPTIMIZE-style lakehouse
  * operation). Streaming sinks and per-day batch jobs accumulate many
  * small files; at 100 TB the scan-task overhead (one task per tiny
  * file, footer reads, scheduler pressure) dominates unless layouts are
  * periodically rewritten into target-sized files.
  *
  * Delta/Iceberg would provide this as `OPTIMIZE`; on plain parquet it is
  * a read → repartition-to-size → atomic-swap rewrite.
  */
object Maintenance {

  /** Rewrites a parquet table into ~targetFileBytes files. Returns
    * (filesBefore, filesAfter). Partitioned layouts are handled by
    * compacting each leaf partition directory in place (layout and
    * partition pruning preserved); flat layouts swap atomically through
    * a temp dir + checked rename ([[Merge.swapInto]]). */
  def compactParquet(spark: SparkSession, dir: String, targetFileBytes: Long = 128L << 20): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    // Bucketed LWW targets ([[Merge.lwwUpsertParquetBucketed]]) are
    // SELF-compacting — every apply replaces each dirty bucket dir
    // whole with one freshly-written file, so bucket dirs never accrete
    // small files and there is nothing for this pass to do. Running it
    // anyway would be actively dangerous: the in-place leaf swap stages
    // `_old` backups INSIDE the table root, where a crash strands a
    // `_bucket=N_old` dir that partition discovery misparses and the
    // bucketed crash recovery (backups under `<dir>_bak`) cannot heal.
    require(!fs.exists(new org.apache.hadoop.fs.Path(dir + "_buckets.json")),
      s"$dir is a bucketed LWW target — it is self-compacting (each apply " +
        "rewrites its dirty buckets whole) and compactParquet's in-root " +
        "backup staging is unsafe for its crash recovery; nothing to do here")

    def leafDirs(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val subdirs = fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      if (subdirs.isEmpty) Seq(p) else subdirs.flatMap(s => leafDirs(s.getPath))
    }

    def compactLeaf(p: org.apache.hadoop.fs.Path): (Int, Int) = {
      val files = fs.listStatus(p).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (files.isEmpty) return (0, 0)
      val nFiles = math.max(1, math.ceil(files.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
      if (nFiles >= files.size) return (files.size, files.size) // already compact
      Merge.swapInto(spark, p.toString,
        spark.read.parquet(p.toString).repartition(nFiles), suffix = "_compacting")
      val after = fs.listStatus(p).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      (files.size, after)
    }

    val results = leafDirs(root).map(compactLeaf)
    (results.map(_._1).sum, results.map(_._2).sum)
  }
}
