package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only measurement (the tools/SkewAB class of utility — NOT part
  * of the engine): the matryoshka two-stage ranker (v20,
  * [[graft.operators.Similarity.matryoshkaTopK]]) in its DEPLOYMENT
  * regime. The corpus's own embeddings are 64-dim, where a 64-dim
  * prefix pass IS the full pass and the honest recorded win was only
  * 1.2×; MRL deployments (Kusupati et al. NeurIPS 2022; the
  * "shortening" contract production embedding APIs ship) run 512–3072
  * dims with a 64-dim coarse prefix — an 8–48× vector-byte ratio.
  * This tool builds that regime: each corpus vector is replicated
  * `replicas`× (id-offset), keeps its original 64 dims as the
  * INFORMATIVE PREFIX, and appends `wideDims − 64` deterministic
  * hash-jitter dims at 0.3× the prefix RMS — full-width cosine order
  * follows the prefix coarsely but not exactly, the MRL shape. Then it
  * interleaves min-of-N timings of the exact full-width ranker vs the
  * two-stage prefix ranker on the SAME session and reports the wall
  * ratio beside the 8× byte ratio, plus stage-recall@k of the
  * two-stage result against the exact one (the overfetch margin's job).
  *
  * args: [srcDir=/root/testdata/sf0.1] [replicas=64] [wideDims=512]
  *       [reps=3]
  */
object WideEmb {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(64)
    val wideDims = args.lift(2).map(_.toInt).getOrElse(512)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExpressions.register(spark)

    val base = graft.io.Corpus.embeddings(spark, src)
    val baseDims = base.select(size(col("embedding"))).head().getInt(0)
    require(wideDims > baseDims, s"wideDims $wideDims must exceed base $baseDims")
    val out = "/tmp/graft_wide_emb/embeddings.parquet"
    val OFF = 100000000L
    base.crossJoin(broadcast(spark.range(replicas).select(col("id").as("_r"))))
      .withColumn("vec_id", col("vec_id") + col("_r") * OFF)
      .drop("_r")
      // rms of the informative prefix scales the jitter tail
      .withColumn("_rms", sqrt(expr("graft_dot(embedding, embedding)") / baseDims))
      .withColumn("embedding", concat(col("embedding"),
        transform(sequence(lit(baseDims + 1), lit(wideDims)),
          i => ((pmod(xxhash64(col("vec_id") * 10000L + i), lit(2001L)) - 1000L)
            .cast("double") / 1000.0 * 0.3 * col("_rms")).cast("float"))))
      .drop("_rms")
      .write.mode("overwrite").parquet(out)
    val emb = spark.read.parquet(out)
    println(s"[wide-emb] corpus: ${emb.count()} vectors x $wideDims dims " +
      s"(prefix $baseDims informative), ${replicas}x replicas")

    // variants interleaved ROUND-ROBIN so host-level noise windows hit
    // all of them equally (the machine's I/O variance is multi-x —
    // consecutive per-variant reps would attribute a noisy window to
    // whichever variant owned it)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("exact full-width top-10",
        () => graft.operators.Similarity.cosineTopK(spark, emb, 100, 10)),
      (s"matryoshka prefix-$baseDims of=4",
        () => graft.operators.Similarity.matryoshkaTopK(spark, emb, 100, 10,
          prefixDims = baseDims, overfetch = 4)),
      (s"matryoshka prefix-$wideDims of=1 (overhead probe)",
        () => graft.operators.Similarity.matryoshkaTopK(spark, emb, 100, 10,
          prefixDims = wideDims, overfetch = 1)),
      (s"matryoshka prefix-$baseDims of=1",
        () => graft.operators.Similarity.matryoshkaTopK(spark, emb, 100, 10,
          prefixDims = baseDims, overfetch = 1)),
      // heap-size isolation: identical plan to exact k=10, heap 40
      ("exact full-width top-40",
        () => graft.operators.Similarity.cosineTopK(spark, emb, 100, 40)))
    val times = Array.fill(variants.size)(List.empty[Double])
    var lastFrames = new Array[DataFrame](variants.size)
    for (_ <- 1 to reps; vi <- variants.indices) {
      val t0 = System.nanoTime()
      val df = variants(vi)._2()
      df.write.format("noop").mode("overwrite").save()
      lastFrames(vi) = df
      times(vi) = ((System.nanoTime() - t0) / 1e9) :: times(vi)
    }
    for (vi <- variants.indices)
      println(f"[wide-emb] ${variants(vi)._1}%-40s min=${times(vi).min}%6.2f s  " +
        s"all=${times(vi).reverse.map(t => f"$t%.2f").mkString(",")}")
    val (tExact, exact) = (times(0).min, lastFrames(0))
    val (tMatry, matry) = (times(1).min, lastFrames(1))
    val exactSet = exact.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val matrySet = matry.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactSet intersect matrySet).size.toDouble / exactSet.size
    println(f"[wide-emb] byte-ratio=${wideDims.toDouble / baseDims}%.1fx " +
      f"wall-ratio=${tExact / tMatry}%.2fx recall@10=$recall%.4f")
    spark.stop()
  }
}
