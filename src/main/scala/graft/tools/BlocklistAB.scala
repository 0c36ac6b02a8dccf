package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for the t70 blocklist scan (the tools/Scratch class of
  * utility — NOT part of the engine): times the one-pass Aho–Corasick
  * expression against the naive per-pattern `contains` sweep it
  * replaces, on the same corpus with the same pattern set, checking the
  * flag counts agree. The naive form is P codegen'd substring scans per
  * row (each `Contains` is itself optimized Spark code — this is an
  * honest baseline, not a strawman).
  *
  * args: [srcDir=/tmp/graft_sf100xd] [reps=3]
  */
object BlocklistAB {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/tmp/graft_sf100xd")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExpressions.register(spark)

    val p8 = Seq("slow fast", "table part", "art", "part", "low",
      "spark a", "zzz quux", "agg row")
    // realistic big badlist: 64 two-word phrases over the fixture
    // vocabulary (mix of present and absent pairs)
    val w1 = Seq("key", "agg", "row", "scan", "slow", "fast", "table", "value")
    val w2 = Seq("part", "hash", "merge", "batch", "spark", "line", "sort", "window")
    val p64 = for (a <- w1; b <- w2) yield s"$a $b"
    val docs = graft.io.Corpus.documents(spark, src)

    def time(label: String)(job: => Long): Unit = {
      // rep 0 warms page cache + JIT; report the min of the rest
      val times = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = job
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.drop(1).map(_._1).min
      println(f"[blocklist-ab] $label%-14s min=${best}%7.2fs flagged=${times.head._2}%d")
    }

    for ((pats, tag) <- Seq((p8, "P=8"), (p64, "P=64"))) {
      time(s"automaton $tag") {
        docs.withColumn("_b", expr("graft_blocklist(text, '" +
            pats.mkString("\t") + "')"))
          .filter(col("_b.n_patterns") > 0).count()
      }
      time(s"naive $tag") {
        docs.filter(pats.map(p => col("text").contains(p)).reduce(_ || _))
          .count()
      }
    }
    spark.stop()
  }
}
