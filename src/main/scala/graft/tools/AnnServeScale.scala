package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.SilverStream

/** Dev-only serving-latency probe for the streaming ANN sink (the
  * tools/CdcScale class of utility — NOT part of the engine): builds
  * the IVF index once over a scale corpus, then drives
  * [[SilverStream.annProbeSink]] with the SAME total query set
  * delivered as micro-batches of 1 / 10 / 100 queries, timing every
  * batch — the measurement that separates the serving loop's fixed
  * per-batch overhead (stream machinery + dirty-bucket upsert swap)
  * from its per-query probe cost. The CdcScale sibling pinned the
  * merge asymmetry; this pins the probe loop.
  *
  * args: [srcDir=/tmp/graft_sf100xe] [nQueries=100] [k=10]
  */
object AnnServeScale {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/tmp/graft_sf100xe")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(100)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val emb = graft.io.Corpus.embeddings(spark, src)
    val n = emb.count()
    val idx = java.nio.file.Files.createTempDirectory("graft_annscale_idx_").toString + "/idx"
    val t0 = System.nanoTime()
    graft.operators.Similarity.buildIvfIndex(spark, emb, idx)
    println(f"[annscale] corpus=$n%d index_build=${(System.nanoTime() - t0) / 1e9}%.2fs")
    graft.util.PhaseTimer.drain()

    // the query set is FIXED across batch sizes — only the batching
    // varies, so latency differences are pure per-batch overhead
    val queries = emb.filter(col("vec_id") < nQueries)
      .as[(Long, Array[Float], Int)].collect().toSeq.sortBy(_._1)
    require(queries.nonEmpty, s"no query vectors below vec_id $nQueries in $src")

    Seq(1, 10, 100).filter(_ <= queries.size).foreach { bs =>
      val out = java.nio.file.Files.createTempDirectory("graft_annscale_out_").toString + "/hits"
      val ck = java.nio.file.Files.createTempDirectory("graft_annscale_ck_").toString
      val input = MemoryStream[(Long, Array[Float], Int)]
      val q = SilverStream.annProbeSink(
          input.toDF().toDF("vec_id", "embedding", "label"), out, idx, k)
        .trigger(Trigger.ProcessingTime(0))
        .option("checkpointLocation", ck)
        .start()
      val batches = queries.grouped(bs).toSeq
      val times = batches.map { b =>
        val s = System.nanoTime()
        input.addData(b: _*)
        q.processAllAvailable()
        (System.nanoTime() - s) / 1e9
      }
      q.stop()
      val total = times.sum
      val rows = spark.read.parquet(out).count()
      println(f"[annscale] batch_size=$bs%3d batches=${batches.size}%4d " +
        f"total=${total}%7.2fs per_batch=${total / batches.size}%6.3fs " +
        f"per_query=${total / queries.size}%6.3fs rows=$rows%d")
    }
    spark.stop()
  }
}
