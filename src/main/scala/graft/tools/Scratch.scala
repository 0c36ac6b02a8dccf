package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only scratch profiler (not part of the engine surface). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  /** Dumps per-micro-batch durations for the streaming queries run
    * inside `f` — where does a stream-stream join's wall time go? */
  def withProgress[T](spark: SparkSession)(f: => T): T = {
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[batch ${p.batchId}] rows=${p.numInputRows} " +
          s"total=${p.batchDuration}ms durations=${p.durationMs} " +
          s"stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} " +
          s"stateCommit=${p.stateOperators.map(_.commitTimeMs).mkString(",")}ms")
      }
    }
    spark.streams.addListener(listener)
    try f finally spark.streams.removeListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_Q", "t69_novel_gram_rate")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_STATESTORE=rocksdb: off-heap state store A/B for the
    // large-state streaming decades (30M-row join state on the default
    // HDFS-backed in-memory maps reads ~60 s GC per p20 300x rep)
    if (sys.env.get("SPARK_GRAFT_STATESTORE").contains("rocksdb"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // warmup
    spark.range(1000000).selectExpr("sum(id) as s").write.format("noop").mode("overwrite").save()

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // plan identity probe: scan split count + shuffle partitions for the
    // documents table on this dir (hypothesis kill for the t69 study:
    // file-split policy / partition-count cliff would show up here);
    // skipped on corpora without a documents table
    try println(s"[scratch] plan probe dir=$dir scanParts=" +
      graft.io.Corpus.documents(spark, dir).rdd.getNumPartitions +
      " shufflePartitions=" + spark.conf.get("spark.sql.shuffle.partitions"))
    catch { case _: org.apache.spark.sql.AnalysisException => () }
    graft.queries.Domain.clearCache()

    // SPARK_GRAFT_Q=__kernel_probe: decompose the fused multi-query
    // kernel's fixed costs (query-collect job vs aggregate job) at the
    // given corpus
    if (qname == "__kernel_probe") {
      graft.functions.GraftExpressions.register(spark)
      val emb = graft.io.Corpus.embeddings(spark, dir)
      for (rep <- 1 to reps) {
        var t0 = System.nanoTime()
        val queries = emb.filter(col("vec_id") < 5)
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("qv"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1).toSeq
        val tCollect = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val blob = graft.functions.MultiQTopK.encodeQueries(queries)
        emb.select(col("vec_id"), col("embedding"))
          .agg(expr(s"graft_multiq_topk(vec_id, embedding, '$blob', 10)").as("tk"))
          .select(explode(col("tk")).as("e"))
          .select(col("e.query_id"), col("e.rank"))
          .write.format("noop").mode("overwrite").save()
        val tAgg = (System.nanoTime() - t0) / 1e9
        println(f"[scratch] kernel-probe rep$rep collect=$tCollect%.3f agg=$tAgg%.3f")
      }
      spark.stop()
      return
    }

    for (rep <- 1 to reps) {
      // calibration: a fixed CPU+shuffle probe — if the measured query's
      // drift tracks this, the drift is machine-level, not query-level
      val c0 = System.nanoTime()
      spark.range(200000000L).select((col("id") % 97).as("k"))
        .groupBy(col("k")).count()
        .write.format("noop").mode("overwrite").save()
      val calib = (System.nanoTime() - c0) / 1e9
      val g0 = gcMs
      time(f"$qname rep$rep dir=$dir calib=$calib%.2f") {
        graft.SparkEntry.queries(qname)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[scratch]   gc=${(gcMs - g0) / 1000.0}%.2f s")
      graft.queries.Domain.clearCache()
    }
    spark.stop()
  }
}
