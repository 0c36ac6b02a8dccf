package graft

import graft.serve.PredictionLog

class PredictionLogSpec extends SparkTestBase {
  import spark.implicits._

  test("append-mode log accumulates across writers without clobbering") {
    val dir = java.nio.file.Files.createTempDirectory("graft_log_").toString + "/log"
    val r1 = Seq(("TN1", "SUCCESS", "2024-01-01")).toDF("tracking_number", "prediction", "log_date")
    val r2 = Seq(("TN2", "PENDING", "2024-01-01"),
      ("TN3", "SUCCESS", "2024-01-02")).toDF("tracking_number", "prediction", "log_date")
    PredictionLog.append(r1, dir)
    PredictionLog.append(r2, dir)
    val back = PredictionLog.read(spark, dir)
    assert(back.count() === 3)
    // partition pruning works on the log_date layout
    val pruned = back.filter($"log_date" === "2024-01-02")
    assert(pruned.count() === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("log_date"),
      s"log_date must be a partition filter:\n$plan")
  }

  test("latestRun resolves the newest dated directory") {
    val root = java.nio.file.Files.createTempDirectory("graft_models_").toString
    Seq("2024-01-01", "2024-03-05", "2024-02-11").foreach { d =>
      java.nio.file.Files.createDirectories(java.nio.file.Path.of(s"$root/$d"))
    }
    assert(PredictionLog.latestRun(spark, root) === Some("2024-03-05"))
    assert(PredictionLog.latestRun(spark, root + "/missing") === None)
  }
}
