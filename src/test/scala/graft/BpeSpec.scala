package graft

import org.apache.spark.sql.functions._

import graft.io.Corpus
import graft.operators.Bpe

/** Distributed BPE merge learning vs a single-node reference
  * implementation of the published algorithm (Sennrich et al. 2016,
  * Algorithm 1) — same `</w>` marker, same overlapping pair counts, same
  * greedy left-to-right merge, same (freq desc, pair asc) tie-break. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference single-node BPE: the ground truth. */
  private def referenceBpe(wordCounts: Map[String, Long],
      nMerges: Int): Seq[Bpe.Merge] = {
    def initial(w: String): Vector[String] = {
      val cs = w.map(_.toString).toVector
      cs.dropRight(1) :+ (cs.last + "</w>")
    }
    def applyM(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    var vocab: Vector[(Vector[String], Long)] =
      wordCounts.toVector.map { case (w, n) => initial(w) -> n }
    val merges = Seq.newBuilder[Bpe.Merge]
    var rank = 1
    var continue = true
    while (rank <= nMerges && continue) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1)
        stats.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + n))
      val eligible = stats.filter(_._2 >= 2)
      if (eligible.isEmpty) continue = false
      else {
        // frequency-tie-break in Unicode CODEPOINT order (= UTF-8 byte
        // order), matching the distributed learner's asc("p") — plain
        // Scala string Ordering would compare UTF-16 code units, which
        // diverges for supplementary-plane symbols
        implicit val cpOrder: Ordering[String] = (x: String, y: String) =>
          java.util.Arrays.compareUnsigned(
            x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val ((a, b), f) = eligible.minBy { case ((l, r), n) => (-n, l, r) }
        merges += Bpe.Merge(rank, a, b, a + b, f)
        vocab = vocab.map { case (syms, n) => applyM(syms, a, b) -> n }
        rank += 1
      }
    }
    merges.result()
  }

  private def wordCountsOf(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("learnMerges reproduces the reference algorithm on the classic corpus") {
    // the worked example from the BPE paper: low/lower/newest/widest
    val texts = Seq(
      ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).trim)
    val got = Bpe.learnMerges(texts.toDF("text"), nMerges = 10)
    val want = referenceBpe(wordCountsOf(texts), nMerges = 10)
    assert(got === want)
    // the fused-marker convention (Sennrich's reference code appends
    // '</w>' to the final CHARACTER) makes the famous first merges
    // "e"+"s" then "es"+"t</w>" (= "est</w>", the -est suffix unit)
    assert(got.take(2).map(m => (m.left, m.right)) ===
      Seq(("e", "s"), ("es", "t</w>")))
    assert(got(1).merged === "est</w>")
  }

  test("learnMerges matches the reference on real corpus text") {
    val docs = Corpus.documents(spark, sf0001)
      .filter(col("doc_id") < 40).select("text")
    val texts = docs.as[String].collect().toSeq
    val got = Bpe.learnMerges(docs, nMerges = 12)
    val want = referenceBpe(wordCountsOf(texts), nMerges = 12)
    assert(got === want)
    assert(got.size === 12, "corpus text has at least 12 merges' worth of pairs")
  }

  test("learnMerges stops early when no pair repeats") {
    val got = Bpe.learnMerges(Seq("ab cd ef").toDF("text"), nMerges = 5)
    assert(got.isEmpty, s"all pairs unique → nothing merges: $got")
  }

  test("applyMergesTo segments concatenate back to the marked words") {
    val texts = Seq(("low " * 5 + "lower " * 2 + "newest " * 6).trim, "widest low")
    val docs = texts.toDF("text")
    val merges = Bpe.learnMerges(docs, nMerges = 6)
    val units = Bpe.applyMergesTo(docs, merges)
      .select(col("text"), col("bpe_units")).as[(String, Seq[String])].collect()
    for ((text, us) <- units) {
      val expected = text.split(" ").filter(_.nonEmpty).map(_ + "</w>").mkString
      assert(us.mkString === expected,
        s"segmentation must be lossless for '$text': $us")
    }
    // learned units actually compress: fewer units than characters
    val (t0, u0) = units.head
    assert(u0.length < t0.count(_ != ' '),
      "merged units must be coarser than characters")
  }

  test("applyMergesTo under a fixed list is greedy, non-overlapping, and cascade-aware") {
    // the t33 shapes the corpus oracle can't exercise: repeated material
    // inside ONE word (greedy left-to-right non-overlap) and a merged
    // symbol that must NOT re-fire as the left of an earlier-rank merge
    val merges = Seq(("h", "a"), ("ha", "s"), ("has", "h</w>"))
      .zipWithIndex.map { case ((l, r), i) => Bpe.Merge(i + 1, l, r, l + r, 0L) }
    val got = Bpe.applyMergesTo(
        Seq("hashhash hash ha h a", "aha").toDF("text"), merges)
      .select(col("bpe_units")).as[Seq[String]].collect().toSeq
    // hashhash: merge1 → [ha,s,h,ha,s,h</w>], merge2 → [has,h,has,h</w>],
    // merge3 fires only on the FINAL (has,h</w>) — the earlier 'has' is
    // followed by plain 'h', proving non-overlap. "ha"/"aha": word-final
    // a carries the marker, so (h,a) never fires there.
    assert(got === Seq(
      Seq("has", "h", "hash</w>", "hash</w>", "h", "a</w>", "h</w>", "a</w>"),
      Seq("a", "h", "a</w>")))
  }

  test("graft_bpe_apply handles single-char, repeated-merge, and supplementary-plane words") {
    // single-pass kernel edge shapes: a one-char word (marker fuses onto
    // the only symbol), a same-symbol merge (greedy non-overlap: aaa →
    // aa,a), and a supplementary-plane code point (𝕏 is two UTF-16 code
    // units — the initial split must not cut the surrogate pair)
    val merges = Seq(("a", "a"))
      .zipWithIndex.map { case ((l, r), i) => Bpe.Merge(i + 1, l, r, l + r, 0L) }
    val got = Bpe.applyMergesTo(
        Seq("a aaa aaaa", "𝕏a x𝕏").toDF("text"), merges)
      .select(col("bpe_units")).as[Seq[String]].collect().toSeq
    // aaaa: the final 'a' carries the marker (a</w> ≠ a), so greedy
    // non-overlap leaves [aa, a, a</w>] — same as the reference scan
    assert(got === Seq(
      Seq("a</w>", "aa", "a</w>", "aa", "a", "a</w>"),
      Seq("𝕏", "a</w>", "x", "𝕏</w>")))
  }

  test("merge-spec wire encoding round-trips and rejects separator symbols") {
    import graft.functions.GraftExpressions
    val pairs = Seq(("e", "s"), ("es", "t</w>"))
    assert(GraftExpressions.decodeMerges(GraftExpressions.encodeMerges(pairs)) === pairs)
    assert(GraftExpressions.decodeMerges(GraftExpressions.encodeMerges(Nil)) === Nil)
    intercept[IllegalArgumentException] {
      GraftExpressions.encodeMerges(Seq(("a\tb", "c")))
    }
  }
}
