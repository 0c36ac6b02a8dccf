package graft

import org.apache.spark.sql.functions._

import graft.functions.MGSummary
import graft.operators.Frequency

/** Misra-Gries heavy hitters: the PODS'12 containment guarantee (no true
  * heavy hitter ever drops out of the summary, under any merge order)
  * and the exactness of the verified output. */
class FrequencySpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force heavy hitters at share > 1/(k+1). */
  private def brute(tokens: Seq[String], k: Int): Seq[(String, Long)] = {
    val n = tokens.size.toLong
    tokens.groupBy(identity).map { case (t, ts) => (t, ts.size.toLong) }
      .filter { case (_, c) => c * (k + 1) > n }
      .toSeq.sortBy { case (t, c) => (-c, t) }
  }

  test("MGSummary never evicts a true heavy hitter, at any insertion order") {
    // adversarial stream: a 40% majority key drowned in 60 distinct rares,
    // only 4 counters — constant eviction pressure
    val stream = Seq.fill(40)("hot") ++ (1 to 60).map(i => s"rare$i")
    for (seed <- Seq(1, 7, 42)) {
      val shuffled = new scala.util.Random(seed).shuffle(stream)
      val s = new MGSummary(4)
      shuffled.foreach(t => s.add(t, 1L))
      val kept = s.sortedEntries().map(_._1).toSet
      assert(kept.contains("hot"),
        s"share 0.4 > 1/5 must survive 4 counters (seed $seed): $kept")
      assert(s.counts.size() <= 4, "summary must respect its bound")
    }
  }

  test("MGSummary merge preserves the guarantee across arbitrary splits") {
    val stream = Seq.fill(50)("hot") ++ (1 to 70).map(i => s"r$i") ++ Seq.fill(30)("warm")
    // total 150; hot share 1/3, warm share 1/5 — both > 1/(k+1) at k=6
    for (cut <- Seq(10, 75, 140)) {
      val (l, r) = new scala.util.Random(cut).shuffle(stream).splitAt(cut)
      val a = new MGSummary(6); l.foreach(a.add(_, 1L))
      val b = new MGSummary(6); r.foreach(b.add(_, 1L))
      a.mergeFrom(b)
      val kept = a.sortedEntries().map(_._1).toSet
      assert(kept.contains("hot") && kept.contains("warm"),
        s"merge at $cut lost a true heavy hitter: $kept")
      assert(a.counts.size() <= 6)
    }
  }

  test("heavyHitters output is exact and partitioning-invariant") {
    val words = Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++
      (1 to 40).map(i => s"tail$i")
    val text = new scala.util.Random(3).shuffle(words).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val k = 5 // threshold n/6 = 15: alpha and beta qualify, no tail does
    val expected = brute(words, k)
    val got = Frequency.heavyHitters(df, k)
      .select("token", "freq").as[(String, Long)].collect().toSeq
    assert(got === expected)
    // chopping the corpus into many docs/partitions must not change it
    val many = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text").repartition(13)
    val got2 = Frequency.heavyHitters(many, k)
      .select("token", "freq").as[(String, Long)].collect().toSeq
    assert(got2 === expected)
  }

  test("heavyHitters shares divide exactly and the empty answer is possible") {
    val df = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    // uniform shares 1/8 = 0.125 < 1/3: nothing qualifies at k=2
    assert(Frequency.heavyHitters(df, 2).count() === 0L)
    val one = Seq((1L, "x x x y")).toDF("doc_id", "text")
    val rows = Frequency.heavyHitters(one, 2)
      .select("token", "freq", "share").as[(String, Long, Double)].collect()
    assert(rows.toSeq === Seq(("x", 3L, 0.75)))
  }

  test("graft_mg_sketch rejects non-string input with a descriptive error") {
    graft.functions.GraftExpressions.register(spark)
    val ex = intercept[Exception] {
      Seq((1L, "a")).toDF("doc_id", "text")
        .agg(expr("graft_mg_sketch(doc_id, 3)")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("must be a string")),
      s"expected the descriptive type error, got: $ex")
  }
}
