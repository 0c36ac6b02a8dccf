package graft.tools
import org.apache.spark.sql.functions._
/** Dev-only identity check (not part of the engine): the codegen'd
  * graft_shingles must equal the interpreted
  * array_sort(array_distinct(ngramsAll(tokens(text)))) chain row for
  * row over a real corpus — the bit-identity claim the r17 swap rests
  * on, checked exhaustively instead of sampled. */
object ShingleIdentity {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(16)
    graft.functions.GraftExpressions.register(spark)
    import graft.functions.TextFunctions._
    for (n <- Seq(2, 3, 5, 13)) {
      val d = graft.io.Corpus.documents(spark, dir)
        .withColumn("oldsh", array_sort(shingles(tokens(col("text")), n)))
        .withColumn("newsh", expr(s"graft_shingles(text, $n)"))
      val bad = d.filter(not(col("oldsh") <=> col("newsh"))).count()
      val total = d.count()
      println(s"[identity] n=$n total=$total mismatches=$bad")
      assert(bad == 0, s"n=$n mismatches=$bad")
    }
    println("[identity] OK")
    spark.stop()
  }
}
