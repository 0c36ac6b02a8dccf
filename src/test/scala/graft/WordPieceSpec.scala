package graft

import org.apache.spark.sql.functions._

import graft.operators.WordPiece

/** WordPiece (Wu et al. 2016 / BERT) against a single-node reference:
  * greedy longest-match-first with the `##` continuation convention,
  * deterministic position-classed vocabulary selection, the [UNK]
  * fallback.
  *
  * The reference here indexes UTF-16 chars — equal to code points on
  * this ASCII fixture; the engine's encode side iterates by CODE POINT
  * (matching the code-point-based vocab selection and t54 oracle), and
  * the supplementary-plane test below pins that alignment directly
  * (BpeSpec carries the family's collation test). */
class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  // ---- single-node reference ----

  private def refVocab(texts: Seq[String], vocabSize: Int, maxLen: Int): Seq[String] = {
    val wf = texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    val acc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- wf; p <- 0 until w.length; l <- 1 to math.min(maxLen, w.length - p)) {
      val raw = w.substring(p, p + l)
      acc(if (p == 0) raw else "##" + raw) += f
    }
    val top = acc.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    val singles = acc.filter { case (p, _) =>
      p.length == 1 || (p.startsWith("##") && p.length == 3) }.toSeq
    (top ++ singles).distinct.sortBy { case (p, c) => (-c, p) }.map(_._1)
  }

  private def refEncode(word: String, vocab: Set[String], maxLen: Int): Seq[String] = {
    var pos = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (pos < word.length) {
      val hit = (math.min(maxLen, word.length - pos) to 1 by -1).iterator
        .map { l =>
          val sub = word.substring(pos, pos + l)
          if (pos == 0) sub else "##" + sub
        }
        .find(vocab.contains)
      hit match {
        case None => return Seq("[UNK]")
        case Some(p) =>
          out += p
          pos += (if (pos == 0) p.length else p.length - 2)
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "stream stream table stream join join scan",
    "table scan stream joinery joinery",
    "scanner scanner stream table")
  private def docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("selectVocab reproduces the reference position-classed selection") {
    val got = WordPiece.selectVocab(docs, vocabSize = 12, maxPieceLen = 4)
    val want = refVocab(corpus, 12, 4)
    assert(got === want)
    // the two position classes are genuinely distinct entries
    assert(got.exists(_.startsWith("##")), "continuation pieces must exist")
    assert(got.exists(p => !p.startsWith("##")), "initial pieces must exist")
    // partitioning cannot change the selection
    val again = WordPiece.selectVocab(docs.repartition(7), vocabSize = 12, maxPieceLen = 4)
    assert(again === got)
  }

  test("encodeWords is greedy longest-match-first, per the reference, for every word") {
    val vocab = WordPiece.selectVocab(docs, vocabSize = 12, maxPieceLen = 4)
    val got = WordPiece.encodeWords(docs, vocab)
      .select("word", "encoded").as[(String, String)].collect().toMap
    val vs = vocab.toSet
    val words = corpus.flatMap(_.split(" ")).distinct
    assert(got.keySet === words.toSet)
    for (w <- words)
      assert(got(w) === refEncode(w, vs, 4).mkString("|"), s"word '$w'")
    // the coverage floor (all single chars, both classes) means no [UNK]
    // on the corpus the vocab was selected from
    assert(!got.values.exists(_.contains("[UNK]")))
  }

  test("greedy prefers the longest piece even when shorter pieces also match") {
    // vocab has both "sc" and "scan": greedy must take "scan", never "sc"
    val vocab = Seq("scan", "sc", "s", "c", "a", "n", "##n", "##e", "##r",
      "##ner", "##a", "##c")
    val out = WordPiece.encodeWords(Seq((1L, "scanner")).toDF("doc_id", "text"), vocab)
      .select("encoded").as[String].head()
    assert(out === "scan|##ner", s"longest match first, got $out")
  }

  test("a position with no matching piece collapses the whole word to [UNK]") {
    val vocab = Seq("a", "##b")
    val out = WordPiece.encodeWords(
      Seq((1L, "ab az")).toDF("doc_id", "text"), vocab)
      .select("word", "n_pieces", "encoded").as[(String, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("ab") === (("ab", 2L, "a|##b")))
    // 'z' has no continuation piece: BERT's whole-word [UNK]
    assert(out("az") === (("az", 1L, "[UNK]")))
  }

  // ---- learning (likelihood-gain merges) reference ----

  private def refApplyMerge(syms: Vector[String], a: String, b: String,
      m: String): Vector[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    for (cur <- syms) {
      if (buf.nonEmpty && buf.last == a && cur == b) buf(buf.size - 1) = m
      else buf += cur
    }
    buf.toVector
  }

  private def refLearn(texts: Seq[String], nMerges: Int)
      : Seq[(String, String, String, Double, Long)] = {
    val wf = texts.flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    var words: Seq[(Vector[String], Long)] = wf.map { case (w, f) =>
      (w.toVector.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c }, f)
    }
    val out = Seq.newBuilder[(String, String, String, Double, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val sym = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      val pair = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((ss, f) <- words) {
        ss.foreach(s => sym(s) += f)
        ss.sliding(2).filter(_.size == 2).foreach(p => pair((p(0), p(1))) += f)
      }
      val cands = pair.toSeq.filter(_._2 >= 2)
        .map { case ((l, rr), fq) =>
          (l, rr, fq.toDouble / (sym(l).toDouble * sym(rr).toDouble), fq)
        }
      if (cands.isEmpty) done = true
      else {
        val (l, rr, sc, fq) = cands.minBy { case (l, rr, sc, _) => (-sc, l, rr) }
        val m = l + rr.stripPrefix("##")
        out += ((l, rr, m, sc, fq))
        words = words.map { case (ss, f) => (refApplyMerge(ss, l, rr, m), f) }
        r += 1
      }
    }
    out.result()
  }

  test("learnMerges matches the single-node likelihood-gain reference merge for merge") {
    val got = WordPiece.learnMerges(docs, nMerges = 6)
      .map(m => (m.left, m.right, m.merged, m.score, m.freq))
    val want = refLearn(corpus, 6)
    assert(got === want)
    // the ratio criterion is genuinely different from BPE's raw
    // frequency: at least one learned merge must not be the round's
    // most frequent pair, or the fixture doesn't discriminate
    assert(got.nonEmpty)
    // partitioning cannot change the learned merges
    val again = WordPiece.learnMerges(docs.repartition(7), nMerges = 6)
      .map(m => (m.left, m.right, m.merged, m.score, m.freq))
    assert(again === got)
  }

  test("learnMerges stops early when no pair repeats; merged symbols keep the class marker") {
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    // every pair occurs once: freq >= 2 never holds, zero merges
    assert(WordPiece.learnMerges(tiny, nMerges = 5) === Seq.empty)
    val rep = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val m = WordPiece.learnMerges(rep, nMerges = 1)
    assert(m.size === 1)
    assert(m.head.left === "a" && m.head.right === "##b" && m.head.merged === "ab",
      s"the continuation marker strips on merge: ${m.head}")
  }

  test("supplementary-plane characters segment by code point, aligned with the vocab unit") {
    // 𝕏/𝕐 (U+1D54F/U+1D550) are 2 UTF-16 chars but 1 code point each.
    // All piece bodies are 1 code point, so maxLen = 1 in the engine's
    // (code-point) unit — a char-based iterator would clamp lengths in a
    // different unit and probe lone-surrogate substrings.
    val sup = "𝕏" // 𝕏
    val sup2 = "𝕐" // 𝕐
    val vocab = Seq(sup, "##y", "##" + sup2)
    val out = WordPiece.encodeWords(
      Seq((1L, s"${sup}y$sup2 ${sup}z")).toDF("doc_id", "text"), vocab)
      .select("word", "n_pieces", "encoded").as[(String, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(s"${sup}y$sup2") === ((s"${sup}y$sup2", 3L, s"$sup|##y|##$sup2")))
    // no ##z piece: whole-word [UNK], even mid-supplementary-word
    assert(out(s"${sup}z") === ((s"${sup}z", 1L, "[UNK]")))
    // a 2-code-point piece spanning a supplementary char is taken
    // greedily over its 1-code-point prefix
    val vocab2 = Seq("a" + sup, "a", "##" + sup, "##b")
    val out2 = WordPiece.encodeWords(
      Seq((1L, s"a${sup}b")).toDF("doc_id", "text"), vocab2)
      .select("encoded").as[String].head()
    assert(out2 === s"a$sup|##b")
  }

  test("the continuation class is respected: an initial-only piece never matches mid-word") {
    // "b" exists only word-initially; mid-word the encoder must fall back
    // to "##b", and if that is absent the word UNKs
    val vocab = Seq("a", "b", "##a")
    val out = WordPiece.encodeWords(Seq((1L, "ba ab")).toDF("doc_id", "text"), vocab)
      .select("word", "encoded").as[(String, String)].collect().toMap
    assert(out("ba") === "b|##a")
    assert(out("ab") === "[UNK]", "no ##b piece: mid-word b is unreachable")
  }
}
