package graft.tools

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
    import graft.io.Corpus
    import graft.operators.Dedup

    // warmup
    spark.range(1000000).selectExpr("sum(id) as s").write.format("noop").mode("overwrite").save()

    val docs = Corpus.documents(spark, dir)
    time("docs count")(docs.count())
    val sim = Dedup.simhashes(docs)
    time("simhashes once")(sim.write.format("noop").mode("overwrite").save())
    time("t08 full")(graft.SparkEntry.queries("t08_dedup_simhash")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    val sh = Dedup.withShingles(docs, 3)
    time("withShingles noop")(sh.write.format("noop").mode("overwrite").save())
    time("t09 full")(graft.SparkEntry.queries("t09_dedup_jaccard_blocked")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
