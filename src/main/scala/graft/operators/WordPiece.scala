package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftExpressions

/** WordPiece tokenization (Wu et al. 2016 §4.1; the BERT vocabulary
  * convention) — the third tokenizer family beside BPE
  * ([[graft.operators.Bpe]]) and unigram ([[graft.operators.Unigram]]).
  * Unlike those two, WordPiece segments by greedy LONGEST-MATCH-FIRST
  * against a position-classed vocabulary: word-initial pieces are stored
  * bare, continuation pieces carry the `##` prefix.
  *
  * The vocabulary here is selected deterministically from position-
  * classed substring counts (the [[Unigram.selectPieces]] discipline
  * applied per class): a substring starting at a word's first character
  * counts toward the bare piece, any other start counts toward the
  * `##`-prefixed piece, each weighted by word frequency. The
  * `vocabSize` highest-count pieces are kept PLUS every single-character
  * piece of both classes (the coverage floor — encode can never hit
  * `[UNK]` on the corpus the vocabulary was selected from, so the whole
  * select+encode pipeline is a pure function of the corpus and the
  * oracle replays it end to end; `[UNK]` remains the serving-time
  * fallback for out-of-corpus characters, unit-tested directly).
  *
  * Scale shape: selection is one corpus scan → distinct-word table
  * (vocabulary-sized) → one explode + hash-shuffle on the classed piece
  * → bounded top-K; encode is one codegen'd expression call per
  * distinct word ([[graft.functions.WordPieceEncode]] — the greedy loop
  * runs inside whole-stage codegen against a broadcast hash set).
  */
object WordPiece {

  /** Position-classed weighted substring counts: (piece, cnt) where
    * word-initial substrings are bare and others carry `##`. */
  def classedCounts(words: DataFrame, maxPieceLen: Int): DataFrame = {
    val subs = flatten(transform(sequence(lit(1), length(col("word"))), p =>
      transform(
        sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - p + 1)),
        l => when(p === 1, col("word").substr(p, l))
          .otherwise(concat(lit("##"), col("word").substr(p, l))))))
    words
      .select(explode(subs).as("piece"), col("wfreq"))
      .groupBy(col("piece")).agg(sum(col("wfreq")).as("cnt"))
  }

  /** Deterministic vocabulary: the `vocabSize` highest-count classed
    * pieces (ties to the lexicographically smaller piece) UNION every
    * single-character piece of both classes, (cnt desc, piece) order. */
  def selectVocab(docs: DataFrame, vocabSize: Int = 40,
      maxPieceLen: Int = 4, textCol: String = "text"): Seq[String] = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen > 1, s"maxPieceLen must exceed 1, got $maxPieceLen")
    val cnts = classedCounts(Unigram.wordFrequencies(docs, textCol), maxPieceLen)
    val isSingle =
      length(col("piece")) === 1 ||
        (col("piece").startsWith("##") && length(col("piece")) === 3)
    val top = cnts.orderBy(col("cnt").desc, col("piece")).limit(vocabSize).collect()
    val singles = cnts.filter(isSingle).collect()
    (top ++ singles)
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("cnt")))
      .distinct
      .sortBy { case (p, c) => (-c, p) }
      .map(_._1)
  }

  /** Greedy longest-match segmentation of every distinct word under a
    * fixed vocabulary. Output: (word, wfreq, n_pieces, encoded) with
    * pieces '|'-joined, word order — the t51 surface, so the two
    * tokenizer-decode gates are directly comparable. */
  def encodeWords(docs: DataFrame, vocab: Seq[String],
      textCol: String = "text"): DataFrame = {
    GraftExpressions.register(docs.sparkSession)
    val spec = GraftExpressions.encodeWordPieceVocab(vocab)
    Unigram.wordFrequencies(docs, textCol)
      .withColumn("_ps",
        call_function("graft_wordpiece_encode", col("word"), lit(spec)))
      .select(col("word"), col("wfreq"),
        size(col("_ps")).cast("long").as("n_pieces"),
        array_join(col("_ps"), "|").as("encoded"))
      .orderBy(col("word"))
  }
}
