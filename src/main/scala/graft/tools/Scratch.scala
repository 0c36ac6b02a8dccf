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

    // warmup
    spark.range(1000000).selectExpr("sum(id) as s").write.format("noop").mode("overwrite").save()

    for (rep <- 1 to reps) {
      time(s"$qname rep$rep dir=$dir") {
        graft.SparkEntry.queries(qname)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.queries.Domain.clearCache()
    }
    spark.stop()
  }
}
