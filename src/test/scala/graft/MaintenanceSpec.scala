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

  test("compaction of a partitioned table preserves layout and pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_p_").toString + "/t"
    spark.range(4000).select(col("id"), (col("id") % 3).cast("string").as("day"))
      .repartition(16).write.partitionBy("day").parquet(dir)
    val (before, after) = Maintenance.compactParquet(spark, dir, targetFileBytes = 1L << 20)
    assert(before === 48 && after === 3, s"got ($before, $after)") // 16 files × 3 partitions → 1 each
    val back = spark.read.parquet(dir)
    assert(back.count() === 4000)
    val pruned = back.filter(col("day") === "1")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"partition layout must survive compaction:\n$plan")
  }
}
