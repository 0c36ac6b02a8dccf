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

  /** Rewrites a parquet directory into ~targetFileBytes files. Returns
    * (filesBefore, filesAfter). The rewrite goes through a sibling temp
    * dir and a rename so readers never see a half-written table. */
  def compactParquet(spark: SparkSession, dir: String, targetFileBytes: Long = 128L << 20): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(path)
    val totalBytes = before.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

    val tmp = new org.apache.hadoop.fs.Path(dir + "_compacting")
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(dir + "_old")
    fs.rename(path, bak)
    fs.rename(tmp, path)
    fs.delete(bak, true)
    (before.size, dataFiles(path).size)
  }
}
