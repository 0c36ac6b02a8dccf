package graft

import org.apache.spark.sql.functions._

import graft.io.Maintenance

class MaintenanceSpec extends SparkTestBase {

  test("compaction collapses many small files and preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString + "/t"
    // 64 tiny files
    spark.range(10000).select(col("id"), (col("id") % 7).as("k"))
      .repartition(64).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir).count()
    val (before, after) = Maintenance.compactParquet(spark, dir, targetFileBytes = 1L << 20)
    assert(before === 64)
    assert(after < 8, s"expected few files, got $after")
    val compacted = spark.read.parquet(dir)
    assert(compacted.count() === beforeRows)
    assert(compacted.agg(sum("id")).head().getLong(0) === (9999L * 10000L) / 2)
  }
}
