package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Model-based quality scoring: CCNet perplexity buckets (Wenzek et al.
  * LREC'20) and the GPT-3 classifier-Pareto rule (Brown et al. 2020,
  * Appendix A), each exercised on planted corpora where the right
  * verdicts are computable by hand. */
class QualitySpec extends SparkTestBase {
  import spark.implicits._

  test("groupMedianMad: exact median/MAD by histogram refinement (odd, even, ties, degenerate)") {
    // odd group: median = middle value; even group: mean of the two
    // middles; ties + a degenerate all-equal group (mad = 0)
    val rows = Seq(
      ("odd", 0.1), ("odd", 0.5), ("odd", 0.9),             // med .5, devs .4 0 .4 → mad .4
      ("even", 0.2), ("even", 0.4), ("even", 0.6), ("even", 1.0), // med .5, devs .3 .1 .1 .5 → mad .2
      ("tie", 0.3), ("tie", 0.3), ("tie", 0.3), ("tie", 0.8), // med .3, devs 0 0 0 .5 → mad 0 → .8 flags
      ("flat", 0.7), ("flat", 0.7))                           // med .7, mad 0, no dev
      .toDF("g", "v")
    val out = graft.operators.Quality.groupMedianMad(rows, "g", "v", buckets = 8)
      .select("g", "v", "med", "mad", "is_outlier")
      .as[(String, Double, Double, Double, Boolean)].collect()
      .groupBy(_._1)
    def medMad(g: String) = { val r = out(g).head; (r._3, r._4) }
    assert(medMad("odd") === ((0.5, 0.4)))
    // expectations must follow the SAME IEEE path the engine takes:
    // devs are abs(v - med) of doubles, mad = (d2 + d3)/2
    assert(medMad("even") ===
      (((0.4 + 0.6) / 2, (math.abs(0.4 - 0.5) + math.abs(0.2 - 0.5)) / 2)))
    assert(medMad("tie") === ((0.3, 0.0)))
    assert(medMad("flat") === ((0.7, 0.0)))
    // mad = 0: any nonzero deviation flags; zero deviation does not
    assert(out("tie").filter(_._5).map(_._2).toSeq === Seq(0.8))
    assert(out("flat").forall(!_._5))
    assert(out("odd").filter(_._5).isEmpty, "0.4 devs are exactly 1x mad, not > 3x")
    // coarse bucketing (8 buckets) must not change exactness — compare
    // against a fine-bucket run
    val fine = graft.operators.Quality.groupMedianMad(rows, "g", "v", buckets = 1 << 14)
      .select("g", "med", "mad").distinct()
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    Seq("odd", "even", "tie", "flat").foreach(g => assert(fine(g) === medMad(g)))
    // out-of-range values clamp into edge buckets but stay exact
    val oor = Seq(("g", -1.5), ("g", 0.5), ("g", 7.0)).toDF("g", "v")
    val m = graft.operators.Quality.groupMedianMad(oor, "g", "v", buckets = 4)
      .select("med").distinct().as[Double].head()
    assert(m === 0.5)
  }

  test("groupMedianMad: null keys, null/NaN values rejected loudly (ADVICE r16)") {
    // each precondition breach must abort with a clear message, not NPE
    // the driver walk or silently drop rows through null-never-equal joins
    def expectReject(df: org.apache.spark.sql.DataFrame, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        graft.operators.Quality.groupMedianMad(df, "g", "v", buckets = 8).collect()
      }
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    expectReject(
      Seq((Some("g"), 0.5), (None, 0.6)).toDF("g", "v"), "null g group key")
    expectReject(
      Seq(("g", Some(0.5)), ("g", Option.empty[Double])).toDF("g", "v"),
      "null or NaN v value")
    expectReject(
      Seq(("g", 0.5), ("g", Double.NaN)).toDF("g", "v"), "null or NaN v value")
  }

  // Two "languages": xx docs drawn from an "alpha beta" vocabulary with
  // the curated (target/positive) slice, yy docs from "gamma delta".
  // Doc 104 is an xx-language OUTLIER written in yy vocabulary — it must
  // score as the most surprising xx doc under xx's target LM, and the
  // classifier must score it like the yy docs.
  private def corpus = Seq(
    (101L, "xx", "cur", "alpha beta alpha beta alpha beta alpha beta"),
    (102L, "xx", "cur", "beta alpha beta alpha beta alpha beta alpha"),
    (103L, "xx", "web", "alpha beta alpha beta gamma beta alpha beta"),
    (104L, "xx", "web", "gamma delta gamma delta gamma delta gamma delta"),
    (105L, "yy", "cur", "gamma delta gamma delta gamma delta gamma delta"),
    (106L, "yy", "web", "delta gamma delta gamma delta gamma delta gamma"),
    (107L, "yy", "web", "gamma delta gamma delta alpha delta gamma delta"),
    (108L, "zz", "web", "alpha gamma alpha gamma alpha gamma alpha gamma"),
    (109L, "xx", "web", ""))
    .toDF("doc_id", "lang", "source", "text")

  test("perplexityBuckets: per-language terciles, outlier lands in tail") {
    val out = Quality.perplexityBuckets(corpus, "text", "doc_id", "lang",
        col("source") === "cur", buckets = 64, sampleK = 10, seed = "s")
      .select("doc_id", "lang", "logpp", "bucket")
      .as[(Long, String, Double, String)].collect()
      .map(r => r._1 -> r).toMap

    assert(!out.contains(109L), "zero-token doc carries no score")
    assert(out.size === 8)
    // the in-vocabulary xx docs beat the yy-vocabulary outlier under xx's LM
    assert(out(104L)._3 > out(101L)._3 && out(104L)._3 > out(103L)._3,
      "outlier is the most surprising xx doc")
    assert(out(104L)._4 === "tail", "outlier lands in xx's tail tercile")
    assert(out(101L)._4 === "head")
    // zz has no target docs: smoothing degrades to the uniform LM, the
    // single doc still buckets (sample of 1 → its own threshold → head)
    assert(out(108L)._4 === "head")
    // every language covers its own tercile range: head ≤ middle ≤ tail
    val byLang = out.values.groupBy(_._2)
    for ((_, docs) <- byLang; h <- docs.filter(_._4 == "head");
         t <- docs.filter(_._4 == "tail"))
      assert(h._3 < t._3, "head logpp below tail logpp within a language")
  }

  test("perplexityBuckets: thresholds come from the fingerprint sample") {
    // sampleK = 1: the single sampled doc's logpp is BOTH thresholds, so
    // buckets are decided entirely by comparison against that one value —
    // head iff logpp <= sample's, else tail (middle empty by construction)
    val out = Quality.perplexityBuckets(corpus, "text", "doc_id", "lang",
        col("source") === "cur", buckets = 64, sampleK = 1, seed = "s")
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(!out.values.exists(_ == "middle"),
      "k=1 sample collapses t1 = t2 — no middle bucket")
  }

  test("classifierPareto: posterior separates classes, rule is the verdict") {
    val out = Quality.classifierPareto(corpus, "text", "doc_id",
        col("lang") === "xx", buckets = 64, alpha = 9.0, seed = "s")
      .select("doc_id", "log_odds", "score", "pareto_x", "kept")
      .as[(Long, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap

    assert(!out.contains(109L), "zero-token doc carries no score")
    // in-vocabulary positives score above the negatives
    assert(out(101L)._3 > out(105L)._3)
    assert(out(102L)._3 > out(106L)._3)
    // the yy-vocabulary xx doc is scored by CONTENT, not by its label:
    // the classifier puts it with the negatives
    assert(out(104L)._3 < out(101L)._3)
    // the published acceptance rule, recomputed per row
    for ((_, (_, _, score, px, kept)) <- out)
      assert(kept === (px > 1.0 - score), "kept ≡ pareto_x > 1 − score")
    // sigmoid sanity: score strictly monotone in log_odds
    val sorted = out.values.toSeq.sortBy(_._2)
    assert(sorted.map(_._3) === sorted.map(_._3).sorted,
      "score monotone in log_odds")
  }

  test("classifierPareto: label inversion exactly negates the data term") {
    // z = prior + Σ[ln p_pos − ln p_neg]: flipping the label swaps the
    // two LMs, so (z − prior) must negate EXACTLY. This pins both LM
    // terms into the posterior — a regression that drops one term (e.g.
    // the semicolon-inference hazard of a leading `- log(...)` line)
    // breaks the symmetry even though orderings survive.
    def run(positive: org.apache.spark.sql.Column) =
      Quality.classifierPareto(corpus, "text", "doc_id", positive,
          buckets = 64, alpha = 9.0, seed = "s")
        .select("doc_id", "log_odds").as[(Long, Double)].collect().toMap
    val fwd = run(col("lang") === "xx")
    val rev = run(col("lang") =!= "xx")
    val priorFwd = math.log(5.0 / 3.0) // 5 xx docs vs 3 non-xx (109 empty)
    val priorRev = math.log(3.0 / 5.0)
    for ((id, z) <- fwd)
      assert(math.abs((z - priorFwd) + (rev(id) - priorRev)) < 1e-9,
        s"doc $id: data terms must negate under label inversion")
  }

  test("classifierPareto: requires valid alpha and buckets") {
    intercept[IllegalArgumentException] {
      Quality.classifierPareto(corpus, "text", "doc_id",
        col("lang") === "xx", buckets = 1, alpha = 9.0, seed = "s")
    }
    intercept[IllegalArgumentException] {
      Quality.classifierPareto(corpus, "text", "doc_id",
        col("lang") === "xx", buckets = 64, alpha = 0.0, seed = "s")
    }
    intercept[IllegalArgumentException] {
      Quality.perplexityBuckets(corpus, "text", "doc_id", "lang",
        col("source") === "cur", buckets = 64, sampleK = 0, seed = "s")
    }
  }

  test("zipfFit recovers a planted exact power law and is partitioning-invariant") {
    // freq = 720720 / rank is an EXACT integer for ranks 1..16, so
    // ln(freq) = ln(720720) − 1·ln(rank) and the least-squares fit must
    // return slope −1, intercept ln(720720) — up to the 10⁻⁶ decimal
    // grid the Σ terms quantize on
    val rows = (1 to 16).map(r => ("g", f"tok$r%02d", 720720L / r))
    val df = rows.toDF("lang", "token", "freq")
    val fit = Quality.zipfFit(df, "lang", "freq", "token").collect()
    assert(fit.length === 1)
    assert(fit(0).getAs[Long]("n_ranks") === 16L)
    assert(math.abs(fit(0).getAs[Double]("zipf_slope") + 1.0) < 1e-3,
      s"slope ${fit(0).getAs[Double]("zipf_slope")}")
    assert(math.abs(fit(0).getAs[Double]("zipf_intercept") - math.log(720720.0)) < 1e-3)
    // a flat (uniform) distribution fits slope 0 — to within the 10⁻⁶
    // decimal grid the Σ terms quantize on (measured residual ~4·10⁻⁷)
    val flat = (1 to 10).map(r => ("u", f"tok$r%02d", 50L)).toDF("lang", "token", "freq")
    val f2 = Quality.zipfFit(flat, "lang", "freq", "token").collect()(0)
    assert(math.abs(f2.getAs[Double]("zipf_slope")) < 1e-5)
    // deterministic under partitioning; bad topRanks rejected
    assert(Quality.zipfFit(df.repartition(5), "lang", "freq", "token")
      .collect().map(_.toSeq).toSeq === fit.map(_.toSeq).toSeq)
    intercept[IllegalArgumentException] {
      Quality.zipfFit(df, "lang", "freq", "token", topRanks = 1)
    }
  }

  test("pmiCollocations: a planted collocation dominates, closed form checks out") {
    // 8 docs "x y", 4 docs "x q y" — bigrams: (x,y)×8, (x,q)×4, (q,y)×4.
    // N=16, c(x,·)=12, c(·,y)=12 → pmi(x,y) = ln(8·16/144)
    val docs = (Seq.fill(8)("x y") ++ Seq.fill(4)("x q y"))
      .zipWithIndex.map { case (t, i) => (i.toLong, "g", t) }
      .toDF("doc_id", "lang", "text")
    val got = Quality.pmiCollocations(docs, "lang", col("text"),
      minCount = 4, topN = 10).collect()
    assert(got.length === 3)
    val byPair = got.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) -> r).toMap
    val xy = byPair(("x", "y"))
    assert(xy.getAs[Long]("c12") === 8L)
    assert(math.abs(xy.getAs[Double]("pmi") - math.log(8.0 * 16 / 144)) < 1e-12)
    // LLR observed/expected closed form for the same cell
    def t(k: Double, r: Double, c: Double) =
      if (k > 0) k * math.log(k * 16 / (r * c)) else 0.0
    val llr = 2.0 * (t(8, 12, 12) + t(4, 12, 4) + t(4, 4, 12) + t(0, 4, 4))
    assert(math.abs(xy.getAs[Double]("llr") - llr) < 1e-9)
    // PMI's textbook rare-pair bias, visible in the fixture: (q,·) pairs
    // score ln(4·16/48) ≈ 0.288 > pmi(x,y) ≈ −0.118 because x and y are
    // margin-heavy — ties between the two q-pairs break on w1 (q < x)
    assert(got.sortBy(_.getAs[Long]("rnk")).map(r =>
      (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSeq ===
      Seq(("q", "y"), ("x", "q"), ("x", "y")))
    // minCount prunes: nothing below 4 observations survives
    assert(got.forall(_.getAs[Long]("c12") >= 4L))
    // partitioning invariance
    val again = Quality.pmiCollocations(docs.repartition(7), "lang", col("text"),
      minCount = 4, topN = 10).collect()
    assert(again.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("kneserNeyScore: all three scoring branches match hand computation") {
    // train "a b a c": c(a,b)=c(b,a)=c(a,c)=1; ctx a:(c1=2,n1p1=2),
    // b:(1,1); cont counts a/b/c = 1 each; 3 bigram types
    val train = Seq((1L, "xx", "a b a c")).toDF("doc_id", "lang", "text")
    // held-out "a b z c a" exercises: interpolated (a,b); OOV (b,z) —
    // z never continues anything; backoff (z,c) — z has no context
    // counts; backoff (c,a) — c appears only as a continuation
    val held = Seq((2L, "xx", "a b z c a")).toDF("doc_id", "lang", "text")
    val row = Quality.kneserNeyScore(train, held, "lang", "doc_id",
      col("text")).collect().head
    assert(row.getAs[Long]("n_bigrams") === 4L)
    assert(row.getAs[Long]("n_oov") === 1L)
    val pAB = (math.max(1 - 0.75, 0) + 0.75 * 2 * (1.0 / 3)) / 2 // 0.375
    val expected = (math.log(pAB) + 2 * math.log(1.0 / 3)) / 3
    // davg quantizes each ln term to the 1e-6 grid before the mean
    assert(math.abs(row.getAs[Double]("mean_logp") - expected) < 1e-5)
    assert(math.abs(row.getAs[Double]("ppl")
      - math.exp(-row.getAs[Double]("mean_logp"))) < 1e-12)
  }

  test("kneserNeyScore: per-context probabilities sum to 1 over the continuation vocab") {
    // KN's discount redistributes mass, never creates or destroys it:
    // for every trained context w1, sum of P(w2|w1) over ALL words with
    // a continuation count must be exactly 1 (the interpolation
    // telescopes: (c1 - D*n1p1 + D*n1p1*sum(pcont))/c1 with sum = 1)
    val train = Seq(
      (1L, "xx", "a b a c b a c c a b"),
      (2L, "xx", "c a b b a")).toDF("doc_id", "lang", "text")
    import graft.functions.TextFunctions.tokens
    val bgd = train.withColumn("sp", tokens(col("text")))
      .select(explode(expr(
        "transform(sequence(1, size(sp) - 1), j -> struct(sp[j-1] AS w1, sp[j] AS w2))"))
        .as("b"))
      .select(col("b.w1"), col("b.w2"))
    val c12 = bgd.groupBy("w1", "w2").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val contVocab = c12.keys.map(_._2).toSet
    val ctx = c12.groupBy(_._1._1).map { case (w1, m) =>
      w1 -> (m.values.sum, m.size) }
    val n1p2 = c12.keys.groupBy(_._2).map { case (w2, ks) => w2 -> ks.size }
    val nTypes = c12.size.toDouble
    for ((w1, (c1, n1p1)) <- ctx) {
      val mass = contVocab.toSeq.map { w2 =>
        val c = c12.getOrElse((w1, w2), 0L).toDouble
        (math.max(c - 0.75, 0) + 0.75 * n1p1 * (n1p2(w2) / nTypes)) / c1
      }.sum
      assert(math.abs(mass - 1.0) < 1e-12, s"context $w1 mass $mass")
    }
    // and the operator agrees with the same closed form on a held doc
    val held = Seq((9L, "xx", "a b c a")).toDF("doc_id", "lang", "text")
    val row = Quality.kneserNeyScore(train, held, "lang", "doc_id",
      col("text")).collect().head
    def p(w1: String, w2: String) = {
      val (c1, n1p1) = ctx(w1)
      (math.max(c12.getOrElse((w1, w2), 0L) - 0.75, 0) +
        0.75 * n1p1 * (n1p2(w2) / nTypes)) / c1
    }
    val exp0 = (math.log(p("a", "b")) + math.log(p("b", "c")) +
      math.log(p("c", "a"))) / 3
    assert(row.getAs[Long]("n_oov") === 0L)
    assert(math.abs(row.getAs[Double]("mean_logp") - exp0) < 1e-5)
  }

  test("goodTuring matches the textbook table on a hand corpus") {
    // units a,a,a,b,b,c: N_1=N_2=N_3=1, N=6
    // r*(1) = 2*N_2/N_1 = 2; r*(2) = 3*N_3/N_2 = 3; r*(3) NULL (N_4=0)
    val docs = Seq(("g", Seq("a", "a", "a", "b", "b", "c")))
      .toDF("lang", "units")
    val got = Quality.goodTuring(docs, "lang", col("units"), maxR = 10)
      .collect().sortBy(_.getAs[Long]("r"))
    assert(got.length === 3)
    assert(got.map(r => (r.getAs[Long]("r"), r.getAs[Long]("n_r"))).toSeq ===
      Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    assert(got(0).getAs[Double]("r_star") === 2.0)
    assert(got(1).getAs[Double]("r_star") === 3.0)
    assert(got(2).isNullAt(got(2).fieldIndex("r_star")),
      "simple GT reports NULL where N_{r+1} = 0, never an extrapolation")
    assert(got.forall(_.getAs[Long]("n_tokens") === 6L))
    assert(got.forall(r => math.abs(r.getAs[Double]("p_unseen") - 1.0 / 6) < 1e-15))
    // no hapaxes -> zero unseen mass
    val noHapax = Quality.goodTuring(
      Seq(("g", Seq("a", "a", "b", "b"))).toDF("lang", "units"),
      "lang", col("units"), maxR = 10).collect()
    assert(noHapax.forall(_.getAs[Double]("p_unseen") === 0.0))
    // partitioning invariance
    val again = Quality.goodTuring(docs.repartition(5), "lang",
      col("units"), maxR = 10).collect().sortBy(_.getAs[Long]("r"))
    assert(again.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq)
  }

  test("kneserNeyScore: an all-OOV doc keeps its row with NULL mean and ppl") {
    val train = Seq((1L, "xx", "a b a")).toDF("doc_id", "lang", "text")
    val held = Seq((2L, "xx", "p q r")).toDF("doc_id", "lang", "text")
    val row = Quality.kneserNeyScore(train, held, "lang", "doc_id",
      col("text")).collect().head
    assert(row.getAs[Long]("n_bigrams") === 2L &&
      row.getAs[Long]("n_oov") === 2L)
    assert(row.isNullAt(row.fieldIndex("mean_logp")) &&
      row.isNullAt(row.fieldIndex("ppl")))
  }

  test("kneserNeyScore: a group with no training data still emits all-OOV rows") {
    // 'yy' never appears in train — its held-out doc must surface as
    // fully OOV, not silently vanish through an inner model join
    val train = Seq((1L, "xx", "a b a")).toDF("doc_id", "lang", "text")
    val held = Seq(
      (2L, "xx", "a b"),
      (3L, "yy", "a b c")).toDF("doc_id", "lang", "text")
    val rows = Quality.kneserNeyScore(train, held, "lang", "doc_id",
      col("text")).collect()
    assert(rows.length === 2, s"the train-less group must keep its row: ${rows.toSeq}")
    val yy = rows.find(_.getAs[String]("lang") == "yy").get
    assert(yy.getAs[Long]("n_bigrams") === 2L && yy.getAs[Long]("n_oov") === 2L)
    assert(yy.isNullAt(yy.fieldIndex("mean_logp")))
  }

  test("charEntropy: textbook values, empty-doc exclusion, partitioning invariance") {
    val docs = Seq(
      (1L, "aabb"),     // uniform over 2 symbols: ln 2 nats, 1 bit/char
      (2L, "aaaa"),     // degenerate: 0
      (3L, "abcd"),     // uniform over 4: ln 4 nats, 2 bits/char
      (4L, "")          // excluded: no distribution to score
    ).toDF("doc_id", "text")
    val out = Quality.charEntropy(docs)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L)._1 === 4L && out(1L)._2 === 2L)
    assert(math.abs(out(1L)._3 - math.log(2.0)) < 1e-15)
    assert(math.abs(out(1L)._4 - 1.0) < 1e-15)
    assert(out(2L)._3 === 0.0)
    assert(math.abs(out(3L)._4 - 2.0) < 1e-15)
    val again = Quality.charEntropy(docs.repartition(7))
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(again === out, "the ordered fold must be partitioning-invariant")
  }

  test("novelGramRate: hand-counted df=1 fractions, short docs excluded, repetition deduped") {
    val docs = Seq(
      (1L, "a b c d"),     // grams {a b c, b c d}: first shared with doc 2
      (2L, "a b c x"),     // grams {a b c, b c x}
      (3L, "z z z z z"),   // "z z z" ×3 but DISTINCT per doc -> 1 gram, df 1
      (4L, "a b")          // < 3 tokens: excluded
    ).toDF("doc_id", "text")
    val out = Quality.novelGramRate(docs, n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((2L, 1L, 0.5)), "a-b-c shared, b-c-d novel")
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((1L, 1L, 1.0)),
      "within-doc repetition must not inflate df (distinct before counting)")
    val again = Quality.novelGramRate(docs.repartition(7), n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(again === out)
  }

  test("heapsFit: hand-traced checkpoints, two-point slope, saturated corpus reads beta 0") {
    // docs 0..3, each "c w{i}": vocabulary grows by one word per doc.
    // K=2 cutoffs: 0+floor(3·1/2)=1 and 3 → (N,V) = (4,3) then (8,5).
    val growing = Seq(
      (0L, "g", "c w0"), (1L, "g", "c w1"), (2L, "g", "c w2"), (3L, "g", "c w3")
    ).toDF("doc_id", "lang", "text")
    val out = Quality.heapsFit(growing, "lang",
        graft.functions.TextFunctions.tokens(col("text")), checkpoints = 2)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(out.map(r => (r._2, r._3, r._4, r._5)).toSeq ===
      Seq((1L, 1L, 4L, 3L), (2L, 3L, 8L, 5L)))
    val beta = out.head._6
    val expected = math.log(5.0 / 3.0) / math.log(2.0)
    assert(math.abs(beta - expected) < 1e-4,
      s"two-point fit must be the secant slope: $beta vs $expected")
    // a fully templated corpus stops discovering words: V flat -> beta 0
    val saturated = Seq.tabulate(6)(i => (i.toLong, "s", "a b"))
      .toDF("doc_id", "lang", "text")
    val sat = Quality.heapsFit(saturated, "lang",
        graft.functions.TextFunctions.tokens(col("text")), checkpoints = 3)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(sat.forall(_._5 === 2L))
    assert(math.abs(sat.head._6) < 1e-4, s"saturated beta: ${sat.head._6}")
  }

  test("rakeKeywords: hand-traced deg/freq scores, run dedup, stopword-only docs absent") {
    val stops = graft.functions.TextFunctions.StopwordList
    val docs = Seq(
      // runs: [deep learning], [deep nets], [wild]
      // deep: freq 2, deg 4 -> 2.0; learning/nets: 1,2 -> 2.0; wild: 1,1 -> 1.0
      // phrases: "deep learning" 4.0, "deep nets" 4.0, "wild" 1.0
      (1L, "deep learning of deep nets in the wild"),
      // the SAME run twice: word stats count both occurrences, the
      // output keeps one row per distinct phrase
      (2L, "fast join and fast join and slow scan"),
      (3L, "the a of"), // all stopwords: no candidates, doc absent
      // leading/consecutive stopwords produce no empty runs
      (4L, "the deep of of sea")
    ).toDF("doc_id", "text")
    val out = Quality.rakeKeywords(docs, stops, topK = 3)
      .as[(Long, String, Long, Double, Long)].collect()
    val byDoc = out.groupBy(_._1)
    assert(!byDoc.contains(3L))
    assert(byDoc(1L).map(r => (r._5, r._2, r._4)).sortBy(_._1).toSeq ===
      Seq((1L, "deep learning", 4.0), (2L, "deep nets", 4.0), (3L, "wild", 1.0)),
      "tie at 4.0 breaks on the phrase string")
    assert(byDoc(2L).map(r => (r._5, r._2, r._4)).sortBy(_._1).toSeq ===
      Seq((1L, "fast join", 4.0), (2L, "slow scan", 4.0)),
      "duplicate run collapses to one scored phrase; freq/deg still count both")
    assert(byDoc(4L).map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq ===
      Seq(("deep", 1L, 1.0), ("sea", 1L, 1.0)))
    val again = Quality.rakeKeywords(docs.repartition(5), stops, topK = 3)
      .as[(Long, String, Long, Double, Long)].collect()
    assert(again.sortBy(r => (r._1, r._5)) === out.sortBy(r => (r._1, r._5)))
  }

  test("blocklistScan: dictionary-suffix reporting, earliest-start position, clean path") {
    val docs = Seq(
      // "part" at 3 also embeds "art" at 4 — output links must report
      // BOTH; "low" never appears standalone, only inside "slow"
      (1L, "a part slow x"),
      (2L, "she shells"), // "he" inside "she" (the classic AC case)
      (3L, "clean text none"),
      (4L, "xart artx")   // "art" twice, "part" never; first start = 2
    ).toDF("doc_id", "text")
    val out = Quality.blocklistScan(docs, Seq("part", "art", "low", "she", "he"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((3L, 3L, true)),
      "part@3 (embedding art@4) + low@9: 3 distinct patterns, first start 3")
    assert(out(2L) === ((2L, 1L, true)), "she@1 must also report the embedded he@2")
    assert(out(3L) === ((0L, -1L, false)))
    assert(out(4L) === ((1L, 2L, true)))
  }

  test("blocklistScan equals the naive per-pattern contains/indexOf sweep on the corpus") {
    val pats = Seq("slow fast", "table part", "art", "part", "low", "spark a",
      "zzz quux", "agg row")
    val docs = graft.io.Corpus.documents(spark, sf0001)
    val got = Quality.blocklistScan(docs, pats)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.nonEmpty)
    texts.foreach { case (id, tx) =>
      val present = pats.filter(tx.contains)
      val first =
        if (present.isEmpty) -1L else present.map(p => tx.indexOf(p) + 1).min.toLong
      assert(got(id) === ((present.size.toLong, first, present.nonEmpty)),
        s"doc $id")
    }
    // the suite must exercise both paths
    assert(got.values.exists(_._3), "no doc hit any pattern — fixture drifted")
    assert(got.values.exists(!_._3) || texts.size < 3)
  }
}
