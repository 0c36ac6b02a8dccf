package graft.tools
import org.apache.spark.sql.functions._
/** Dev-only tokenize-cost probe (not part of the engine). */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val docs = graft.io.Corpus.documents(spark, "/tmp/graft_docs100x")
    def time(label: String)(f: => Unit): Unit =
      for (i <- 1 to 2) { val t0 = System.nanoTime(); f
        println(f"[probe] $label run$i: ${(System.nanoTime()-t0)/1e9}%.2f s") }
    time("explode(tokens(text)) count-agg") {
      docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
        .groupBy(col("w")).count().write.format("noop").mode("overwrite").save()
    }
    time("explode(split) raw baseline") {
      docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).count().write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
