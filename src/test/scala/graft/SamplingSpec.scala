package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic hash-split: stability, disjointness, proportions. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(n.toLong).select(col("id").as("doc_id"),
      concat(lit("document body number "), col("id"), lit(" with some text")).as("text"))

  test("hashSplit: every row gets exactly one split; assignment is content-determined") {
    val split = Sampling.hashSplit(corpus(500), "text")
    assert(split.count() === 500)
    assert(split.where(!col("split").isin("train", "validation", "test")).isEmpty)
    // same content → same split, regardless of partitioning
    val again = Sampling.hashSplit(corpus(500).repartition(13), "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(first === again, "split assignment must not depend on partitioning")
  }

  test("hashSplit: proportions approximate the cuts and survive corpus growth") {
    val n = 2000
    val counts = Sampling.hashSplit(corpus(n), "text")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // hash buckets are uniform-ish; allow generous tolerance at n=2000
    assert(math.abs(counts("train") - 0.80 * n) < 0.06 * n, s"train ~80%: $counts")
    assert(math.abs(counts("validation") - 0.10 * n) < 0.04 * n, s"validation ~10%: $counts")
    assert(math.abs(counts("test") - 0.10 * n) < 0.04 * n, s"test ~10%: $counts")
    // growing the corpus never reassigns an existing key (randomSplit does)
    val small = Sampling.hashSplit(corpus(500), "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val grown = Sampling.hashSplit(corpus(n), "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, s) => grown(id) === s },
      "existing keys keep their split when the corpus grows")
  }

  test("hashSplit: custom cuts partition the bucket space in order") {
    val rows = Sampling.hashSplit(corpus(300), "text",
      Seq("a" -> 50, "b" -> 25, "c" -> 25))
      .select("bucket", "split").as[(Long, String)].collect()
    rows.foreach { case (b, s) =>
      val expect = if (b < 50) "a" else if (b < 75) "b" else "c"
      assert(s === expect, s"bucket $b mapped to $s")
    }
    intercept[IllegalArgumentException](
      Sampling.hashSplit(corpus(1), "text", Seq("x" -> 60, "y" -> 60)))
  }

  test("portableFingerprint: codegen'd Fold31 is bit-identical to the HOF contract form") {
    // The portable fold is a cross-engine CONTRACT (t10/t14/t19/t20/t25
    // oracles + the DuckDB foldSql mirror all gate on it). The codegen'd
    // expression must reproduce the original HOF definition exactly —
    // including multi-byte code points, which `split(s,'')`+`ascii` folds
    // per code point.
    val hof = expr("""aggregate(
      filter(split(s, ''), ch -> ch != ''),
      0L, (h, ch) -> pmod(h * 31 + ascii(ch), 2147483647))""")
    val edge = Seq("", " ", "a", "plain ascii text 123!?",
      "héllo wörld", "中文 text €’",
      "emoji 😀🚀 mix", "tab\tand\nnewline",
      ("repeat " * 400) + "é中😀").toDF("s")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text").as("s"))
    Seq(edge, docs).foreach { df =>
      val bad = df.select(col("s"),
          Sampling.portableFingerprint("s").as("fast"), hof.as("contract"))
        .filter(col("fast") =!= col("contract"))
      assert(bad.isEmpty, s"Fold31 diverged from the HOF contract: ${bad.take(3).toSeq}")
    }
  }

  private def mixCorpus(n: Int) =
    corpus(n).withColumn("lang",
      when(col("doc_id") % 4 === 0, "fr").otherwise("en"))

  test("stratifiedKeep: rates apply per stratum; absent strata keep everything") {
    val n = 2000
    val kept = Sampling.stratifiedKeep(mixCorpus(n), "text", "lang", Map("en" -> 40))
      .filter(col("kept")).groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("fr") === n / 4, "absent stratum must keep 100%")
    val nEn = n - n / 4
    assert(math.abs(kept("en") - 0.40 * nEn) < 0.07 * nEn, s"en ~40%: $kept")
    // rate 0 keeps nothing; rate 100 keeps everything
    val edge = Sampling.stratifiedKeep(mixCorpus(n), "text", "lang",
      Map("en" -> 0, "fr" -> 100))
    assert(edge.filter(col("kept") && col("lang") === "en").isEmpty)
    assert(edge.filter(!col("kept") && col("lang") === "fr").isEmpty)
    intercept[IllegalArgumentException](
      Sampling.stratifiedKeep(mixCorpus(1), "text", "lang", Map("en" -> 101)))
  }

  test("stratifiedKeep: decision is content-determined, stable under partitioning and growth") {
    val first = Sampling.stratifiedKeep(mixCorpus(600), "text", "lang", Map("en" -> 40))
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    val again = Sampling.stratifiedKeep(mixCorpus(2000).repartition(17), "text", "lang",
      Map("en" -> 40))
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(first.forall { case (id, k) => again(id) === k },
      "keep decisions must not depend on partitioning or corpus size")
  }

  test("trainingOrder: a reproducible permutation — dense per-shard positions, seed-keyed") {
    val n = 700
    val ord = Sampling.trainingOrder(corpus(n), "doc_id", seed = "e1", nShards = 8)
      .select("doc_id", "shard", "pos", "global_pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(ord.length === n)
    // positions within each shard are exactly 0..count-1 (a permutation)
    ord.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $shard positions must be dense from 0")
    }
    // global_pos is collision-free and consistent with (pos, shard)
    assert(ord.map(_._4).distinct.length === n)
    ord.foreach { case (_, shard, pos, g) => assert(g === pos * 8 + shard) }
    // same seed → identical order, independent of partitioning
    val again = Sampling.trainingOrder(corpus(n).repartition(11), "doc_id", "e1", 8)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap
    assert(ord.map(r => r._1 -> r._4).toMap === again)
    // a different seed is a different permutation (epochs don't repeat order)
    val e2 = Sampling.trainingOrder(corpus(n), "doc_id", "e2", 8)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap
    assert(ord.count { case (id, _, _, g) => e2(id) == g } < n / 4,
      "different seed must reorder most of the corpus")
  }

  test("trainingOrder: seed is data — quotes and SQL metacharacters are legal") {
    val n = 200
    // would have broken analysis (or silently changed the key) when the
    // seed was spliced into an expr() string
    val hostile = Sampling.trainingOrder(corpus(n), "doc_id",
        seed = "ep'1; --)", nShards = 4)
      .select("doc_id", "global_pos").as[(Long, Long)].collect().toMap
    assert(hostile.size === n && hostile.values.toSeq.distinct.length === n)
    // the fingerprint key is exactly seed + ":" + id — proved by
    // recomputing one row's shard with the same public fingerprint
    val fp = Sampling.portableUniformFingerprint(lit("ep'1; --):0")).cast("long")
    val expectShard = spark.range(1).select(pmod(fp, lit(4L))).head().getLong(0)
    val gotShard = hostile(0L) % 4
    assert(gotShard === expectShard, "seed must reach the hash verbatim")
  }

  test("tokenBudgetKeep: two-level running sum ≡ one window over the canonical order") {
    val docs = mixCorpus(900)
      .withColumn("n_tokens", (pmod(col("doc_id") * 7919, lit(40)) + 1).cast("long"))
    val twoLevel = Sampling.tokenBudgetKeep(docs, "text", "doc_id", "lang",
      "n_tokens", Map("en" -> 2000L), defaultBudget = 800L, nBuckets = 16)
      .select("doc_id", "cum_before", "kept").as[(Long, Long, Boolean)].collect()
      .sortBy(_._1)
    // naive single-window reference over the same canonical order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(pmod(Sampling.portableFingerprint("text"), lit(16)),
        Sampling.portableFingerprint("text"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select("doc_id", "cum_before").as[(Long, Long)].collect().toMap
    twoLevel.foreach { case (id, cum, _) =>
      assert(cum === naive(id), s"doc $id: two-level cum must equal the one-window cum")
    }
    // the budget is an actual cap: kept tokens stop within one doc of it
    val keptTokens = docs.join(
        twoLevel.toSeq.toDF("doc_id", "cum_before", "kept"), "doc_id")
      .filter(col("kept")).groupBy(col("lang"))
      .agg(sum(col("n_tokens")).as("tok")).as[(String, Long)].collect().toMap
    assert(keptTokens("en") >= 2000L && keptTokens("en") < 2000L + 40,
      s"en keeps through the doc that crosses 2000: $keptTokens")
    assert(keptTokens("fr") >= 800L && keptTokens("fr") < 800L + 40,
      s"fr keeps through the doc that crosses 800: $keptTokens")
  }

  test("tokenBudgetKeep: a zero budget keeps nothing; a huge budget keeps everything") {
    val docs = mixCorpus(200).withColumn("n_tokens", lit(5L))
    val zero = Sampling.tokenBudgetKeep(docs, "text", "doc_id", "lang",
      "n_tokens", Map.empty, defaultBudget = 0L, nBuckets = 8)
    assert(zero.filter(col("kept")).isEmpty)
    val all = Sampling.tokenBudgetKeep(docs, "text", "doc_id", "lang",
      "n_tokens", Map.empty, defaultBudget = Long.MaxValue, nBuckets = 8)
    assert(all.filter(!col("kept")).isEmpty)
  }

  test("dsirResample: target-domain docs outweigh off-target docs; partitioning-invariant") {
    // two disjoint vocabularies: every A-doc gram is frequent in the
    // target LM, every B-doc gram target-absent (add-one smoothed) —
    // so every A weight must strictly exceed every B weight
    val docs = (0L until 20L).map { i =>
      if (i % 2 == 0) (i, "alpha beta gamma delta alpha beta", "A")
      else (i, "omega psi chi phi omega psi", "B")
    }.toDF("doc_id", "text", "dom")
    val out = Sampling.dsirResample(docs, "text", "doc_id",
      col("dom") === "A", buckets = 1024, seed = "s", tau = 0.0)
    val w = out.select("doc_id", "weight").as[(Long, Double)].collect().toMap
    assert(w.size === 20)
    val aMin = (0L until 20L by 2).map(w).min
    val bMax = (1L until 20L by 2).map(w).max
    assert(aMin > bMax, s"target-domain min weight $aMin must exceed off-target max $bMax")
    val again = Sampling.dsirResample(docs.repartition(7), "text", "doc_id",
      col("dom") === "A", buckets = 1024, seed = "s", tau = 0.0)
    assert(out.collect().toSeq === again.collect().toSeq)
    // the Gumbel perturbation is seed-keyed: a different seed must move
    // at least one gumbel_key (weights stay identical)
    val reseeded = Sampling.dsirResample(docs, "text", "doc_id",
      col("dom") === "A", buckets = 1024, seed = "s2", tau = 0.0)
    val k1 = out.select("gumbel_key").as[Double].collect().toSeq
    val k2 = reseeded.select("gumbel_key").as[Double].collect().toSeq
    assert(k1 !== k2)
    assert(out.select("weight").as[Double].collect().toSeq ===
      reseeded.select("weight").as[Double].collect().toSeq)
  }

  test("temperatureKeep: α-flattening boosts the low-resource stratum; total tracks target") {
    // 900 A-docs vs 100 B-docs, α=0.5: q ∝ {0.9^0.5, 0.1^0.5} → shares
    // 0.75/0.25 of a 500-doc target → rate_A ≈ 0.4167, rate_B caps at 1
    val docs = (0L until 1000L).map(i =>
      (i, s"doc body $i unique", if (i < 900) "A" else "B")).toDF("doc_id", "text", "lang")
    val out = Sampling.temperatureKeep(docs, "text", "lang", alpha = 0.5, targetRows = 500L)
    val rates = out.select("lang", "rate").distinct().as[(String, Double)].collect().toMap
    assert(rates("B") === 1.0, s"low-resource stratum must cap at rate 1, got $rates")
    // the normalizer goes through the DECIMAL(30,6) detour, so rates
    // carry its ~1e-7 relative rounding — that rounding IS the contract
    assert(math.abs(rates("A") - 500.0 * 0.75 / 900.0) < 1e-6, s"got $rates")
    val kept = out.filter(col("kept")).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(kept("B") === 100L, "rate-1 stratum keeps everything")
    assert(math.abs(kept("A") - 375L) < 60, s"A keeps ≈ rate·n, got $kept")
    // pure function of (stats, key): partitioning can't move a verdict
    val again = Sampling.temperatureKeep(docs.repartition(7), "text", "lang",
      alpha = 0.5, targetRows = 500L)
    assert(out.orderBy("doc_id").collect().toSeq ===
      again.orderBy("doc_id").collect().toSeq)
    // a NULL stratum forms its own group and still receives a verdict —
    // a sampling op must never silently drop data rows
    val withNull = docs.withColumn("lang",
      when(col("doc_id") < 10, lit(null: String)).otherwise(col("lang")))
    val judged = Sampling.temperatureKeep(withNull, "text", "lang", 0.5, 500L)
    assert(judged.count() === 1000L, "every row judged, including null-stratum rows")
    assert(judged.filter(col("lang").isNull).count() === 10L)
  }

  test("temperatureKeep: the DECIMAL(30,6) normalizer grid is exactly the documented contract") {
    // The q34 lesson generalized (the Num.dsum magnitude precondition):
    // each share^α summand quantizes to the 1e-6 grid HALF_UP before the
    // sum. Three equal strata make the sub-grid digits visible — q =
    // (1/3)^1 = 0.3333333... quantizes to 0.333333, so z = 0.999999, NOT
    // the exact double sum ≈ 1.0. The rates must match the quantized
    // reference to the bit and must NOT match the naive double
    // normalizer — pinning that we know exactly what the grid does to
    // the smallest digits (α < 1 RAISES small shares toward 1, so terms
    // can only fall below the grid when a stratum holds < 1e-6^(1/α) of
    // the corpus — the documented migration edge).
    val docs = (0L until 9L).map(i =>
      (i, s"body $i", (i % 3).toString)).toDF("doc_id", "text", "lang")
    val out = Sampling.temperatureKeep(docs, "text", "lang",
      alpha = 1.0, targetRows = 1L)
    val rates = out.select("lang", "rate").distinct()
      .as[(String, Double)].collect().toMap
    val qExact = 3.0 / 9.0
    val qGrid = BigDecimal(qExact).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val zGrid = (qGrid * 3).toDouble // 0.999999 — the quantized normalizer
    val want = 1.0 * (qExact / zGrid) / 3.0
    val naive = 1.0 * (qExact / (qExact * 3)) / 3.0
    for (s <- Seq("0", "1", "2")) {
      assert(rates(s) === want, s"stratum $s must carry the grid-quantized rate")
      assert(rates(s) !== naive, "the naive double normalizer would hide the grid")
    }
    // and the per-term grid error obeys the documented <= 5e-7 bound
    assert(math.abs(qGrid.toDouble - qExact) <= 5e-7)
  }

  test("stratifiedSample: k smallest fingerprints per stratum; growth displaces at most one") {
    val docs = (0L until 120L).map(i =>
      (i, s"body of document number $i", if (i % 3 == 0) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.stratifiedSample(docs, "text", "lang", "doc_id", k = 5)
      .select("lang", "rank", "doc_id", "fp").as[(String, Long, Long, Long)].collect()
    assert(out.count(_._1 == "en") === 5 && out.count(_._1 == "fr") === 5)
    // brute force: the k smallest (fp, id) per stratum, rank order intact
    val brute = docs
      .withColumn("fp", Sampling.portableFingerprint("text"))
      .select("lang", "doc_id", "fp").as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._3, r._2)).take(5).map(_._2).toSeq)
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.sortBy(_._2).map(_._3).toSeq === brute(lang), s"$lang selection")
    }
    // heap path ≡ window path on growth, and one new doc displaces ≤ 1 pick
    val grown = docs.unionByName(Seq((999L, "zz", "en")).toDF("doc_id", "text", "lang"))
    val after = Sampling.stratifiedSample(grown, "text", "lang", "doc_id", k = 5)
      .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    val before = out.filter(_._1 == "en").map(_._3).toSet
    assert((before diff after).size <= 1, "growth reshuffles at most one pick")
    // partitioning invariance
    val again = Sampling.stratifiedSample(docs.repartition(11), "text", "lang", "doc_id", 5)
      .select("lang", "rank", "doc_id", "fp").as[(String, Long, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq === again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("portableUniformFingerprint: seeded consecutive ids are equidistributed") {
    // The hazard this primitive exists for: the raw fold's high bits are
    // PREFIX-dominated, so for `seed:<id>` keys with consecutive integer
    // ids, fold/2³¹ is near-constant (every 3-digit id under one seed
    // landed in [0.4540, 0.4541]) and ORDER BY fold(id) is numeric id
    // order. Any operator drawing uniforms or ordering picks from seeded
    // ids MUST use the remix; this test pins both halves of that story.
    val n = 5000
    val keys = spark.range(n).select(
      concat(lit("uniformity-seed:"), col("id").cast("string")).as("k"))
    val mixed = keys.select(
      (Sampling.portableUniformFingerprint(col("k")).cast("double")
        / 2147483647.0).as("u"))
    val deciles = mixed.groupBy(floor(col("u") * 10).as("d")).count()
      .as[(Long, Long)].collect().toMap
    assert(deciles.size === 10, s"every decile occupied: $deciles")
    deciles.foreach { case (d, c) =>
      // binomial σ ≈ 21 at n=5000, p=0.1; ±5σ is a loose, stable gate
      assert(math.abs(c - n / 10) < 110, s"decile $d holds $c of $n")
    }
    // the raw fold on the SAME keys collapses into a narrow band per
    // id-length class (the prefix owns the high bits; only the last few
    // digits jitter) — the documented failure mode, asserted on the
    // 4-digit class so the distinction stays real
    val rawSpread = spark.range(1000, 5000).select(
        (Sampling.portableFingerprint(
          concat(lit("uniformity-seed:"), col("id").cast("string"))).cast("double")
          / 2147483647.0).as("u"))
      .agg((max(col("u")) - min(col("u"))).as("spread"))
      .as[Double].head()
    assert(rawSpread < 0.05, s"raw fold unexpectedly uniform (spread $rawSpread) — " +
      "if this fires the fold changed and the remix rationale needs revisiting")
  }

  test("unimaxAllocate: closed form ≡ the paper's greedy loop, across budget regimes") {
    // four strata with unequal token masses (A 300, B 900, C 2400, D 300 —
    // A/D tie in capacity, exercising the (capacity, stratum) tie-break)
    val docs = ((0L until 30L).map(i => (i, "A", 10L)) ++
      (30L until 60L).map(i => (i, "B", 30L)) ++
      (60L until 90L).map(i => (i, "C", 80L)) ++
      (90L until 120L).map(i => (i, "D", 10L)))
      .toDF("doc_id", "lang", "n_tokens")
    // the paper's greedy, verbatim: ascending capacity, equal share of
    // the remainder, capped at own capacity
    def greedy(caps: Seq[(String, Long)], budget: Long): Map[String, Double] = {
      val sorted = caps.sortBy { case (s, c) => (c, s) }
      var remaining = budget.toDouble
      sorted.zipWithIndex.map { case ((s, c), i) =>
        val b = math.min(c.toDouble, remaining / (sorted.size - i))
        remaining -= b
        s -> b
      }.toMap
    }
    val caps = Seq("A" -> 600L, "B" -> 1800L, "C" -> 4800L, "D" -> 600L)
    for (budget <- Seq(100L, 900L, 2500L, 6000L, 50000L)) {
      val alloc = Sampling.unimaxAllocate(docs, "lang", "n_tokens", budget, maxEpochs = 2)
        .select("lang", "lang_budget").as[(String, Double)].collect().toMap
      val exp = greedy(caps, budget)
      caps.foreach { case (s, _) =>
        assert(math.abs(alloc(s) - exp(s)) <= 1e-9 * math.max(1.0, exp(s)),
          s"budget=$budget stratum=$s: closed form ${alloc(s)} vs greedy ${exp(s)}")
      }
      // conservation: allocations sum to min(budget, total capacity)
      val total = math.min(budget.toDouble, caps.map(_._2).sum.toDouble)
      assert(math.abs(alloc.values.sum - total) < 1e-6, s"budget=$budget sum=$alloc")
    }
  }

  test("unimaxKeep: capped strata repeat exactly; expected tokens track the budget") {
    val docs = ((0L until 50L).map(i => (i, "low", 4L)) ++
      (50L until 1050L).map(i => (i, "high", 10L)))
      .toDF("doc_id", "lang", "n_tokens")
    // token masses: low 200, high 10000 → capacities 400 / 20000 at 2
    // epochs. Budget 3000: low is capped (400·2 = 800 ≤ 3000), high
    // takes the remaining 2600 → rate 0.26
    val out = Sampling.unimaxKeep(docs, "doc_id", "lang", "n_tokens",
      budget = 3000L, maxEpochs = 2, seed = "unimax-spec-seed-long-enough-to-wrap")
    val byLang = out.groupBy("lang").agg(
      min(col("rate")).as("rmin"), max(col("rate")).as("rmax"),
      sum(col("n_copies") * col("n_tokens")).as("tok_out"),
      min(col("n_copies")).as("cmin"), max(col("n_copies")).as("cmax"))
      .select("lang", "rmin", "rmax", "tok_out", "cmin", "cmax")
      .as[(String, Double, Double, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // a capped stratum's rate is EXACTLY maxEpochs and every doc gets
    // exactly that many copies — no rounding noise
    assert(byLang("low")._2 === 2.0 && byLang("low")._3 === 2.0)
    assert(byLang("low")._5 === 2L && byLang("low")._6 === 2L)
    assert(byLang("low")._4 === 400L, "capped stratum emits its full capacity")
    // the uncapped stratum's realized tokens track its water-fill share
    val highBudget = 3000.0 - 400.0
    assert(byLang("high")._2 === byLang("high")._3, "one rate per stratum")
    assert(math.abs(byLang("high")._4 - highBudget) < 0.15 * highBudget,
      s"expected ≈$highBudget tokens, got ${byLang("high")._4}")
    // copies differ by at most one within a stratum (stochastic rounding)
    assert(byLang("high")._6 - byLang("high")._5 <= 1L)
    // pure function of (stats, seed, id): partitioning can't move a copy
    val again = Sampling.unimaxKeep(docs.repartition(7), "doc_id", "lang",
      "n_tokens", 3000L, 2, "unimax-spec-seed-long-enough-to-wrap")
    assert(out.orderBy("doc_id").collect().toSeq ===
      again.orderBy("doc_id").collect().toSeq)
    // budget beyond total capacity: everything capped at maxEpochs
    val all = Sampling.unimaxKeep(docs, "doc_id", "lang", "n_tokens",
      budget = 1000000L, maxEpochs = 3, seed = "unimax-spec-seed-long-enough-to-wrap")
    assert(all.filter(col("n_copies") =!= 3L || !col("capped")).count() === 0L)
    // a NULL stratum still receives an allocation and copy counts
    val withNull = docs.withColumn("lang",
      when(col("doc_id") < 5, lit(null: String)).otherwise(col("lang")))
    val judged = Sampling.unimaxKeep(withNull, "doc_id", "lang", "n_tokens",
      3000L, 2, "s1")
    assert(judged.count() === 1050L)
    assert(judged.filter(col("lang").isNull && col("n_copies").isNull).count() === 0L)
  }

  test("the round-9 sampling/similarity operators validate parameters loudly") {
    val docs = Seq((1L, "a b", "x")).toDF("doc_id", "text", "lang")
    intercept[IllegalArgumentException] {
      Sampling.temperatureKeep(docs, "text", "lang", alpha = 1.5, targetRows = 10L)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureKeep(docs, "text", "lang", alpha = 0.5, targetRows = -1L)
    }
    intercept[IllegalArgumentException] {
      Sampling.dsirResample(docs, "text", "doc_id", col("lang") === "x",
        buckets = 1, seed = "s", tau = 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.semDedup(spark,
        Seq((1L, Array(1.0f), 0)).toDF("vec_id", "embedding", "label"), k = 0, threshold = 0.9)
    }
  }

  // ---- weighted reservoir (Efraimidis-Spirakis A-Res) ----

  private def refMix(s: String): Long = {
    val fold = graft.functions.Fold31.fold(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (fold * 2654435761L) % 2147483647L
  }

  private def refReservoir(items: Seq[(Long, Double)], k: Int, seed: String)
      : Seq[(Long, Double)] = // (id, key), rank order
    items.filter(_._2 > 0)
      .map { case (id, w) =>
        val u = (refMix(s"$seed:$id") + 1).toDouble / 2147483647.0
        (id, math.log(u) / w)
      }
      .sortBy { case (id, key) => (-key, id) }
      .take(k)

  test("weightedReservoir reproduces the reference A-Res winners and ranking") {
    val items = (0L until 200L).map(i => (i, 1.0 + (i % 7).toDouble))
    val df = items.toDF("doc_id", "w")
    val got = Sampling.weightedReservoir(df, "doc_id", col("w"), k = 20,
      seed = "spec")
      .select("doc_id", "res_key", "rank").as[(Long, Double, Long)].collect()
    val want = refReservoir(items, 20, "spec")
    assert(got.map(_._1).toSeq === want.map(_._1),
      "winner ids and order must match the single-node reference")
    assert(got.map(_._3).toSeq === (1L to 20L))
    for (((_, k1, _), (_, k2)) <- got.zip(want))
      assert(math.abs(k1 - k2) < 1e-12, "keys match up to log ulp")
    // partitioning cannot move a winner (pure function of seed, id, w)
    val again = Sampling.weightedReservoir(df.repartition(13), "doc_id",
      col("w"), k = 20, seed = "spec").select("doc_id").as[Long].collect()
    assert(again.toSeq === got.map(_._1).toSeq)
  }

  test("weightedReservoir: weights bias inclusion; zero weights excluded; k > n returns all") {
    // 50 heavy (w=200) vs 450 light (w=1): heavies should dominate the
    // k=25 sample by a wide margin
    val items = (0L until 500L).map(i => (i, if (i < 50) 200.0 else 1.0))
    val win = Sampling.weightedReservoir(items.toDF("doc_id", "w"),
      "doc_id", col("w"), k = 25, seed = "bias")
      .select("doc_id").as[Long].collect()
    assert(win.count(_ < 50) >= 18,
      s"200x weights must dominate the sample, got ${win.count(_ < 50)}/25")
    // zero/negative weights never win
    val withZero = Seq((1L, 0.0), (2L, -3.0), (3L, 1.0)).toDF("doc_id", "w")
    val w3 = Sampling.weightedReservoir(withZero, "doc_id", col("w"),
      k = 5, seed = "z").select("doc_id").as[Long].collect()
    assert(w3.toSeq === Seq(3L))
    intercept[IllegalArgumentException] {
      Sampling.weightedReservoir(withZero, "doc_id", col("w"), k = 0, seed = "z")
    }
  }

  test("kmvQuantiles: group ≤ k degenerates to exact quantiles; partitioning-invariant") {
    // heavy value ties on purpose: the (value, id) total order must
    // resolve them identically in the sample rank and the exact rank
    val rows = (0L until 40L).map(i => (s"g${i % 2}", i, (i % 10).toDouble))
    val df = rows.toDF("grp", "id", "v")
    val qs = Seq(0.25, 0.5, 0.75, 1.0)
    val got = Sampling.kmvQuantiles(df, "grp", "id", col("v"), qs, k = 64, seed = "s")
      .collect()
    assert(got.length === 8) // 2 groups × 4 quantiles
    val byGrp = rows.groupBy(_._1)
    for (r <- got) {
      assert(r.getAs[Long]("msize") === 20L)
      assert(r.getAs[Long]("n") === 20L)
      // sample == group, so the estimate IS the exact (value, id)-order
      // statistic and the verify pass must agree with the sample rank
      assert(r.getAs[Long]("true_rank") === r.getAs[Long]("sample_rank"))
      val sorted = byGrp(r.getString(0)).sortBy(t => (t._3, t._2))
      val idx = math.ceil(r.getAs[Double]("q") * sorted.size).toInt - 1
      assert(r.getAs[Double]("est_value") === sorted(idx)._3)
    }
    val again = Sampling.kmvQuantiles(df.repartition(7), "grp", "id", col("v"),
      qs, k = 64, seed = "s").collect()
    assert(again.map(_.toSeq).toSeq === got.map(_.toSeq).toSeq,
      "bottom-k retention is a pure row property — partitioning cannot move it")
  }

  test("kmvQuantiles: k ≪ n measured rank error stays in the O(1/√k) family") {
    // a permutation of 0..2999 as values: every rank distinct, n/k = 30
    val df = (0L until 3000L).map(i => ("g", i, (i * 7 % 3000).toDouble))
      .toDF("grp", "id", "v")
    val out = Sampling.kmvQuantiles(df, "grp", "id", col("v"),
      Seq(0.1, 0.5, 0.9), k = 100, seed = "acc").collect()
    assert(out.length === 3)
    for (r <- out) {
      assert(r.getAs[Long]("msize") === 100L)
      assert(r.getAs[Long]("n") === 3000L)
      // 1/√100 = 0.1; a 2σ envelope — deterministic given the seed, so
      // this is a regression pin, not a flaky statistical assertion
      assert(r.getAs[Double]("rank_err") < 0.2,
        s"rank_err ${r.getAs[Double]("rank_err")} at q=${r.getAs[Double]("q")}")
    }
    intercept[IllegalArgumentException] {
      Sampling.kmvQuantiles(df, "grp", "id", col("v"), Seq(0.5), k = 0, seed = "s")
    }
    intercept[IllegalArgumentException] {
      Sampling.kmvQuantiles(df, "grp", "id", col("v"), Seq(1.5), k = 8, seed = "s")
    }
  }
}
