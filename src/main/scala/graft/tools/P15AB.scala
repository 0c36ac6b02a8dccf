package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only A/B (not part of the engine surface): adjudicates p15's
  * 2.00× floor reading (VERDICT r17 #2). The 0.73 s BenchReference
  * floor is a BENCH_r12 artifact — the last round the CDC upsert ran
  * the whole-table copy-on-write path (`lwwUpsertParquet`); commit
  * 2ba63e5 (pre-r13) bucket-partitioned the target, and every post-r12
  * reading sits at 1.05–1.47 s. This tool replays the EXACT p15 stream
  * body under both layouts, interleaved, fresh dirs per rep, so the
  * bucketing cost is measured in isolation from suite noise:
  *
  *   sbt "runMain graft.tools.P15AB [sfDir] [reps]"
  */
object P15AB {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    // warmup (the Bench discipline)
    spark.range(1000000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    def onePass(buckets: Option[Int]): Double = {
      val out = java.nio.file.Files.createTempDirectory("graft_p15ab_").toString + "/state"
      val ck = java.nio.file.Files.createTempDirectory("graft_p15ab_ck_").toString
      val t0 = System.nanoTime()
      val src = graft.io.Corpus.normalizeEventTs(
        spark.readStream.schema(spark.read.parquet(s"$dir/events.parquet").schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
      val q = graft.streaming.SilverStream
        .cdcUpsertSink(src, out, "user_id", Seq("ts", "event_id"), buckets)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
      spark.read.parquet(out)
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy(col("user_id"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (rep <- 1 to reps) {
      val b = onePass(Some(16))
      val f = onePass(None)
      println(f"[p15ab] rep$rep bucketed16=$b%.2f s flat=$f%.2f s")
    }
    spark.stop()
  }
}
