package graft.tools

import org.apache.spark.sql.functions._

import graft.io.{Corpus, Merge}

/** Dev-only measurement (not part of the engine surface): per-apply
  * cost of the streaming CDC upsert against a LARGE target with a SMALL
  * batch — the asymmetry the sf-scale p15 runs hide (there target ≈
  * updates). Builds a keyed LWW target from a scaled events corpus
  * twice (bucketed and whole-table layouts), then applies an identical
  * tiny update batch to each and reports the apply seconds plus dirty
  * bucket count. The bucketed apply must be bound by dirty-bucket
  * bytes (batch keys × bucket size), the flat apply by TABLE bytes.
  *
  *   sbt "runMain graft.tools.CdcScale /tmp/graft_sf100x 1024 100"
  */
object CdcScale {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/tmp/graft_sf100x")
    val numBuckets = args.lift(1).map(_.toInt).getOrElse(1024)
    val batchKeys = args.lift(2).map(_.toInt).getOrElse(100)
    // key-shifted replication on top of the corpus (the ScaleUp recipe)
    // to reach a decade the pre-built corpora don't cover
    val reps = args.lift(3).map(_.toInt).getOrElse(1)
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cdcscale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = java.nio.file.Files.createTempDirectory("graft_cdcscale_").toString
    val dirB = s"$base/bucketed"
    val dirF = s"$base/flat"
    val ev0 = Corpus.events(spark, src)
      .filter(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
    val ev = if (reps <= 1) ev0 else ev0
      .withColumn("_r", explode(sequence(lit(0L), lit(reps - 1L))))
      .withColumn("event_id", col("event_id") + col("_r") * lit(10000000000L))
      .drop("_r")
    val n = ev.count()
    println(s"[cdcscale] target rows: $n, buckets: $numBuckets, batch keys: $batchKeys")
    time("bootstrap_bucketed")(
      Merge.lwwUpsertParquetBucketed(spark, dirB, ev, "event_id",
        Seq("ts", "event_id"), numBuckets))
    time("bootstrap_flat")(
      Merge.lwwUpsertParquet(spark, dirF, ev, "event_id", Seq("ts", "event_id")))
    // the update batch: batchKeys existing keys, ts bumped an hour so
    // every update strictly wins its key's LWW argmax
    val batch = ev.orderBy(col("event_id")).limit(batchKeys)
      .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
      .withColumn("event_type", lit("cdc_update"))
      .localCheckpoint()
    val dirty = time("apply_bucketed")(
      Merge.lwwUpsertParquetBucketed(spark, dirB, batch, "event_id",
        Seq("ts", "event_id"), numBuckets))
    println(s"[cdcscale] dirty buckets: ${dirty.size} of $numBuckets")
    time("apply_flat")(
      Merge.lwwUpsertParquet(spark, dirF, batch, "event_id", Seq("ts", "event_id")))
    // both layouts converged to the same table?
    val cb = spark.read.parquet(dirB).filter(col("event_type") === "cdc_update").count()
    val cf = spark.read.parquet(dirF).filter(col("event_type") === "cdc_update").count()
    println(s"[cdcscale] updated rows bucketed=$cb flat=$cf (expect $batchKeys each)")
    spark.stop()
  }
}
