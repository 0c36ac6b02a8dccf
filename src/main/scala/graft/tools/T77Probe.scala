package graft.tools
import org.apache.spark.sql.functions._
/** Dev-only t77 100x stage attribution (not part of the engine). */
object T77Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_docs100x")
    val spark = graft.GraftSession.local(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = graft.io.Corpus.documents(spark, dir).repartition(64)
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val para = docs.filter(col("doc_id") % 37 === 0)
      .withColumn("text", concat_ws(" ",
        transform(toks, (t, i) => when((i + 1) % 45 === 0, lit("xyzzy")).otherwise(t))))
    val rev = docs.filter(col("doc_id") % 41 === 0 && col("doc_id") % 37 =!= 0)
      .withColumn("text", concat_ws(" ", reverse(toks)))
    val ev = para.unionByName(rev).select("doc_id", "text")
    def hashedShingles(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.withShingles(d, 3)
        .select(col("doc_id"), size(col("shingles")).as("sz"), explode(col("shingles")).as("sh"))
        .select(col("doc_id"), col("sz"), xxhash64(col("sh")).as("xsh"))
    val exT = hashedShingles(docs).persist()
    time("train hashed shingles explode+persist")(exT.count())
    val exE = hashedShingles(ev).persist()
    time("eval hashed shingles explode+persist")(exE.count())
    def sigs(ex: org.apache.spark.sql.DataFrame, k: Int) = {
      val sigCols = (0 until k).map(i => min(xxhash64(lit(i), col("xsh"))).as(s"h$i"))
      ex.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    }
    val sT = sigs(exT, 64)
    val sE = sigs(exE, 64)
    def bandKeys(s: org.apache.spark.sql.DataFrame) = {
      val bh = array((0 until 16).map { b =>
        xxhash64((lit(b) +: (b*4 until (b+1)*4).map(i => col(s"h$i"))): _*)
      }: _*)
      s.select(col("doc_id"), posexplode(bh).as(Seq("band_idx", "band_hash")))
    }
    val cand = bandKeys(sT).as("x")
      .join(broadcast(bandKeys(sE).as("y")),
        col("x.band_idx") === col("y.band_idx") && col("x.band_hash") === col("y.band_hash"))
      .select(col("x.doc_id").as("train_doc"), col("y.doc_id").as("eval_doc")).distinct()
    val out = cand
      .join(exT.select(col("doc_id").as("train_doc"), col("sz").as("sza"), col("xsh")), "train_doc")
      .join(broadcast(exE.select(col("doc_id").as("eval_doc"), col("sz").as("szb"), col("xsh"))),
        Seq("eval_doc", "xsh"))
      .groupBy(col("train_doc"), col("eval_doc"), col("sza"), col("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= 0.85)
    time("bands + candidates + exact verify")(println("hits=" + out.count()))
    spark.stop()
  }
}
