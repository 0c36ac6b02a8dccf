package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch profiler (not part of the engine surface). */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)

    @volatile var spillMem = 0L
    @volatile var spillDisk = 0L
    @volatile var shuffleWrite = 0L
    @volatile var gcTime = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillMem += m.memoryBytesSpilled
          spillDisk += m.diskBytesSpilled
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          gcTime += m.jvmGCTime
        }
      }
    })

    // warmup
    spark.range(1000000).selectExpr("sum(id) as s").write.format("noop").mode("overwrite").save()
    Thread.sleep(500); spillMem = 0; spillDisk = 0; shuffleWrite = 0; gcTime = 0

    val p01 = graft.SparkEntry.queries("p01_silver_flatten")(spark, dir)
    time("p01 full noop")(p01.write.format("noop").mode("overwrite").save())
    Thread.sleep(1000)
    println(s"[scratch] p01 spillMem=${spillMem / 1048576}MB spillDisk=${spillDisk / 1048576}MB " +
      s"shuffleWrite=${shuffleWrite / 1048576}MB gcTime=${gcTime}ms")

    spillMem = 0; spillDisk = 0; shuffleWrite = 0; gcTime = 0
    val p02 = graft.SparkEntry.queries("p02_courier_metrics")(spark, dir)
    time("p02 full noop")(p02.write.format("noop").mode("overwrite").save())
    Thread.sleep(1000)
    println(s"[scratch] p02 spillMem=${spillMem / 1048576}MB spillDisk=${spillDisk / 1048576}MB " +
      s"shuffleWrite=${shuffleWrite / 1048576}MB gcTime=${gcTime}ms")

    spark.stop()
  }
}
