package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{GraftExpressions, TextFunctions}

/** Text function unit + property tests (SURVEY §5.2): token counts,
  * shingles, jaccard bounds, rolling-hash determinism. */
class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens drops empties; counts match") {
    val df = Seq("a  b c", "", " ", "single").toDF("text")
    val counts = df.select(TextFunctions.tokenCount(col("text"))).as[Int].collect()
    assert(counts.toSeq === Seq(3, 0, 0, 1))
  }

  test("shingles: n-gram count and short-doc guard") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("s"))
    val sizes = df.select(size(col("s"))).as[Int].collect()
    assert(sizes.toSeq === Seq(2, 0)) // "a b c","b c d"; too short → empty
    val first = df.select(col("s")).as[Seq[String]].head()
    assert(first === Seq("a b c", "b c d"))
  }

  test("jaccard: identical → 1, disjoint → 0, known overlap") {
    val df = Seq(
      (Seq("x", "y"), Seq("x", "y")),
      (Seq("x"), Seq("y")),
      (Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("a", "b")
    val j = df.select(TextFunctions.jaccard(col("a"), col("b"))).as[Double].collect()
    assert(j(0) === 1.0 && j(1) === 0.0 && j(2) === 0.5)
  }

  test("rolling hash: matches reference implementation on generated strings") {
    GraftExpressions.register(spark)
    def refHash(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    val gen = Gen.listOfN(40, Gen.asciiPrintableStr)
    val samples = gen(Gen.Parameters.default, Seed(42L)).get :+ "" :+ "héllo wörld ünïcode"
    val df = samples.toDF("t")
      .select(col("t"), expr("graft_rolling_hash(t)").as("h"))
      .as[(String, Long)].collect()
    df.foreach { case (s, h) => assert(h === refHash(s), s"for '$s'") }
  }

  test("langid marker hits are exact") {
    val toks = TextFunctions.tokens(col("text"))
    val df = Seq("the cat and the dog", "le chat et la mer", "xyz qqq").toDF("text")
    val en = df.select(size(filter(toks, t => t.isInCollection(TextFunctions.LangMarkers("en"))))).as[Int].collect()
    val fr = df.select(size(filter(toks, t => t.isInCollection(TextFunctions.LangMarkers("fr"))))).as[Int].collect()
    assert(en.toSeq === Seq(3, 0, 0)) // the, and, the
    assert(fr.toSeq === Seq(0, 3, 0)) // le, et, la
  }
}
