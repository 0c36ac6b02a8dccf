package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram
import graft.operators.Unigram.Piece

/** Unigram tokenizer (Kudo ACL'18) against a single-node reference: the
  * distributed selection/encode/learn must reproduce the plain-Scala
  * algorithm exactly — shuffles and partitioning cannot change counts,
  * scores, or segmentations. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  // ---- single-node reference implementation ----

  private def refWordFreq(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }

  private def refSubstrCounts(wf: Map[String, Long], maxLen: Int): Map[String, Long] = {
    val acc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, f) <- wf; p <- 0 until w.length; l <- 1 to math.min(maxLen, w.length - p))
      acc(w.substring(p, p + l)) += f
    acc.toMap
  }

  private def refSelect(cnts: Map[String, Long], vocabSize: Int): Seq[(String, Long)] = {
    val top = cnts.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    val singles = cnts.filter(_._1.length == 1).toSeq
    (top ++ singles).distinct
  }

  private def refLogp(entries: Seq[(String, Long)]): Seq[Piece] = {
    val total = entries.map(_._2).sum
    entries.sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => Piece(p, c, math.log(c.toDouble / total.toDouble)) }
  }

  private def refViterbi(word: String, lp: Map[String, Double], maxLen: Int): Seq[String] = {
    val n = word.length
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    dp(0) = 0.0
    val back = Array.fill(n + 1)(-1)
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i) {
      val sc = lp.get(word.substring(j, i)) match {
        case Some(v) => dp(j) + v
        case None if i - j == 1 => dp(j) - 100.0
        case None => Double.NegativeInfinity
      }
      if (sc > dp(i)) { dp(i) = sc; back(i) = j }
    }
    var pos = n
    var out = List.empty[String]
    while (pos > 0) { out = word.substring(back(pos), pos) :: out; pos = back(pos) }
    out
  }

  private val corpus = Seq(
    "stream stream table stream join join scan",
    "table scan stream joinery joinery",
    "scanner scanner stream table")
  private def docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("selectPieces reproduces the reference top-K + singles selection with identical logp") {
    val got = Unigram.selectPieces(docs, vocabSize = 10, maxPieceLen = 3)
    val want = refLogp(refSelect(refSubstrCounts(refWordFreq(corpus), 3), 10))
    assert(got === want)
    // partitioning cannot change the selection
    val again = Unigram.selectPieces(docs.repartition(7), vocabSize = 10, maxPieceLen = 3)
    assert(again === got)
  }

  test("encodeWords reproduces the reference Viterbi for every word") {
    val vocab = Unigram.selectPieces(docs, vocabSize = 10, maxPieceLen = 3)
    val lp = vocab.map(p => (p.piece, p.logp)).toMap
    val got = Unigram.encodeWords(docs, vocab)
      .select("word", "encoded").as[(String, String)].collect().toMap
    val wf = refWordFreq(corpus)
    assert(got.keySet === wf.keySet)
    for ((w, _) <- wf)
      assert(got(w) === refViterbi(w, lp, 3).mkString("|"), s"word '$w'")
  }

  test("viterbi tie-break prefers the longest final piece (smallest j)") {
    // ln-free crafted scores: ab exactly ties a+b — the fold must keep ab
    val vocab = Seq(Piece("ab", 1, -2.0), Piece("a", 1, -1.0), Piece("b", 1, -1.0))
    val out = Unigram.encodeWords(Seq((1L, "ab")).toDF("doc_id", "text"), vocab)
      .select("encoded").as[String].head()
    assert(out === "ab")
    // and a strictly better split wins over the long piece
    val vocab2 = Seq(Piece("ab", 1, -3.0), Piece("a", 1, -1.0), Piece("b", 1, -1.0))
    val out2 = Unigram.encodeWords(Seq((1L, "ab")).toDF("doc_id", "text"), vocab2)
      .select("encoded").as[String].head()
    assert(out2 === "a|b")
  }

  test("unknown single characters fall back to the UNK penalty, never crash") {
    val vocab = Seq(Piece("a", 1, -1.0), Piece("b", 1, -1.0))
    val out = Unigram.encodeWords(Seq((1L, "azb")).toDF("doc_id", "text"), vocab)
      .select("word", "n_pieces", "encoded").as[(String, Long, String)].head()
    assert(out === (("azb", 3L, "a|z|b")))
  }

  test("tab/newline-bearing text degrades to whitespace tokens instead of aborting") {
    // the piece-spec wire format reserves tab and newline as separators;
    // a single-space split would let them survive into words and trip
    // encodePieces's require — the operator must tokenize on \s+ instead
    val messy = Seq(
      (1L, "stream\tstream table\nstream  join\r\njoin scan"),
      (2L, "table scan stream joinery joinery"),
      (3L, "scanner scanner stream table"))
      .toDF("doc_id", "text")
    val clean = Seq(
      (1L, "stream stream table stream join join scan"),
      (2L, "table scan stream joinery joinery"),
      (3L, "scanner scanner stream table"))
      .toDF("doc_id", "text")
    val vGot = Unigram.learn(messy, vocabSize = 8, maxPieceLen = 3, rounds = 2,
      seedMultiplier = 2)
    val vWant = Unigram.learn(clean, vocabSize = 8, maxPieceLen = 3, rounds = 2,
      seedMultiplier = 2)
    assert(vGot === vWant, "whitespace flavor cannot change the learned vocabulary")
    val eGot = Unigram.encodeWords(messy, vGot)
      .select("word", "encoded").as[(String, String)].collect().sorted.toSeq
    val eWant = Unigram.encodeWords(clean, vWant)
      .select("word", "encoded").as[(String, String)].collect().sorted.toSeq
    assert(eGot === eWant)
  }

  test("learn matches the single-node reference Viterbi-EM round for round") {
    val vocabSize = 8
    val maxLen = 3
    val rounds = 3
    val got = Unigram.learn(docs, vocabSize, maxLen, rounds, seedMultiplier = 2)

    // reference EM
    val wf = refWordFreq(corpus)
    val singles = wf.keySet.flatMap(_.toSeq).map(_.toString)
    var vocab = refLogp(refSelect(refSubstrCounts(wf, maxLen), vocabSize * 2))
    for (_ <- 1 to rounds) {
      val lp = vocab.map(p => (p.piece, p.logp)).toMap
      val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, f) <- wf; piece <- refViterbi(w, lp, maxLen)) counts(piece) += f
      val top = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
      val keptSingles = singles.toSeq.sorted.map(s => (s, math.max(counts(s), 1L)))
      vocab = refLogp((top ++ keptSingles).distinct
        .groupBy(_._1).map { case (p, cs) => (p, cs.map(_._2).max) }.toSeq)
    }
    assert(got === vocab)
    // every single character survives learning (coverage floor)
    val pieces = got.map(_.piece).toSet
    assert(singles.forall(pieces.contains), "all single chars must be retained")
    // and learning is partitioning-invariant
    val again = Unigram.learn(docs.repartition(5), vocabSize, maxLen, rounds,
      seedMultiplier = 2)
    assert(again === got)
  }
}
