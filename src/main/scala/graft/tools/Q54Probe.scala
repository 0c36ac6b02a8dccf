package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.Num
/** Dev-only q54 100x attribution probe (not part of the engine): how
  * much of the rank-family query is the segment-bounded window sort? */
object Q54Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_sf10x_r17")
    val spark = graft.GraftSession.local(32)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); f
        println(f"[probe] $label run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    val spendJoin = graft.io.Corpus.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(Num.dsum(col("o_totalprice")).as("spend"))
      .join(graft.io.Corpus.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("spend"))
    time("agg+join only")(noop(spendJoin))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("spend").desc, col("c_custkey"))
    time("agg+join+ranks (q54 minus output sort)")(noop(spendJoin
      .select(col("c_custkey"), col("c_mktsegment"), col("spend"),
        ntile(10).over(w).cast("long").as("decile"),
        dense_rank().over(w).cast("long").as("drank"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))))
    val spec = graft.queries.Registry.specs.find(_.name == "q54_rank_family").get
    time("full q54 (incl. output sort)")(noop(spec.run(spark, dir)))
    spark.stop()
  }
}
