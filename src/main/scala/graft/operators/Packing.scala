package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy concat-and-chunk sequence packing for LLM training: documents
  * are concatenated in a deterministic order and cut into fixed
  * `ctxLen`-token training sequences; each document learns the sequence
  * range `[seq_first, seq_last]` it occupies (a document crossing a
  * boundary spans several sequences — the standard pack-then-chunk
  * layout, no padding waste).
  *
  * Scale shape: a single global running sum would be one window task, so
  * the corpus is sharded by content hash first — packing is independent
  * per shard (the production layout: one packed output stream per
  * shard), the running-sum window runs per shard, and shard count scales
  * with the corpus. Order within a shard is (fingerprint, id): fully
  * deterministic under any input partitioning, file layout, or engine.
  * All arithmetic is integer (token counts, running sums, `DIV`), so
  * results are bit-identical cross-engine — the t20 oracle replays the
  * same layout in DuckDB.
  *
  * Reference scope: the reference pipeline has no packing stage; this
  * extends its training-data surface per the large-scale-pipeline
  * mandate (SURVEY §2.13).
  */
object Packing {

  /** Adds `shard`, `cum_before` (tokens packed before this doc in its
    * shard), `seq_first`, `seq_last` to `df`. `tokenCol` must be a
    * non-negative integer column; rows with 0 tokens are dropped (they
    * occupy no sequence). `idCol` breaks ties between identical keys. */
  def packSequences(df: DataFrame, keyCol: String, idCol: String,
      tokenCol: String, ctxLen: Int, nShards: Int): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("_fp"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.filter(col(tokenCol) > 0)
      .withColumn("_fp", Sampling.portableFingerprint(keyCol))
      .withColumn("shard", pmod(col("_fp"), lit(nShards)))
      .withColumn("cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("seq_first", expr(s"cum_before DIV $ctxLen"))
      .withColumn("seq_last", expr(s"(cum_before + $tokenCol - 1) DIV $ctxLen"))
      .drop("_fp")
  }

  /** Overlapping fixed-size token chunking (the RAG / sliding-window
    * training shape): each document's token array splits into
    * `ctxLen`-token chunks starting every `ctxLen - overlap` tokens, so
    * consecutive chunks share `overlap` tokens, every token appears in at
    * least one chunk, and only the final chunk may be short. Adds
    * `chunk_idx` (0-based) and `chunk_text`. Entirely per-row
    * (`transform` + `posexplode`) — scan speed, no shuffle, parallelism =
    * input partitioning. Rows with an empty token array are dropped. */
  def chunkTokens(df: DataFrame, toksCol: String, ctxLen: Int, overlap: Int): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    require(overlap >= 0 && overlap < ctxLen,
      s"overlap must be in [0, ctxLen), got $overlap for ctxLen $ctxLen")
    val stride = ctxLen - overlap
    val n = size(col(toksCol))
    val starts = sequence(
      lit(1), when(n > ctxLen, n - ctxLen + stride).otherwise(lit(1)), lit(stride))
    df.filter(n > 0)
      .select(col("*"), posexplode(
        transform(starts, s => concat_ws(" ", slice(col(toksCol), s, lit(ctxLen)))))
        .as(Seq("chunk_idx", "chunk_text")))
  }

  /** Per-sequence document-boundary table for a [[packSequences]] layout:
    * one row per (shard, sequence, document) with the token span
    * `[start_in_seq, end_in_seq)` the document occupies inside that
    * sequence — the metadata a training loader needs to reset position
    * ids and build block-diagonal attention masks at document boundaries
    * inside packed sequences (cross-document attention is what packing
    * naively breaks). Derived arithmetically from the pack layout: a
    * per-row explode over each doc's `[seq_first, seq_last]` range —
    * adds NO shuffle beyond what packing already did, and spans tile
    * each sequence gaplessly by construction (asserted in PackingSpec).
    * `ctxLen` and `tokenCol` must be the values the layout was packed
    * with. */
  def sequenceBoundaries(packed: DataFrame, ctxLen: Int,
      tokenCol: String = "n_tokens"): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    packed
      .select(col("shard"), col("doc_id"), col("cum_before"), col(tokenCol).as("_nt"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .select(col("shard"), col("seq"), col("doc_id"),
        greatest(lit(0L), col("cum_before") - col("seq") * ctxLen).as("start_in_seq"),
        least(lit(ctxLen.toLong),
          col("cum_before") + col("_nt") - col("seq") * ctxLen).as("end_in_seq"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al., "Efficient
    * Training of Language Models to Fill in the Middle", 2022): a
    * `ratePct`% subset of documents is rewritten into the PSM layout
    * `<PRE> prefix <SUF> suffix <MID> middle` — teaching an
    * autoregressive model to infill — while the rest pass through
    * untouched (the paper's joint FIM+AR recipe). The gate and both cut
    * points derive from the portable content fingerprint, so which docs
    * transform and WHERE they split is a pure function of (seed, id,
    * length): reproducible across runs, partitionings, and engines — the
    * oracle replays every byte. Character-level splits (the paper's
    * context-level char variant); cut1 ≤ cut2 are the ordered pair of
    * two hash uniforms scaled to [0, len]. Per-row `substring`/`concat`
    * only — scan speed, zero shuffle, at any corpus size.
    *
    * Adds `fim` (did this doc transform) and `fim_text` (PSM layout, or
    * the original text). Sentinels are plain tokens here; a real
    * tokenizer maps them to reserved ids downstream. */
  def fimTransform(df: DataFrame, textCol: String, idCol: String,
      seed: String, ratePct: Int): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100, s"ratePct must be in 0..100, got $ratePct")
    // remixed: gate and cut points are per-id uniforms — the raw fold's
    // prefix-dominated high bits would cut every same-length id at the
    // same relative position
    def fp(tag: String) = Sampling.portableUniformFingerprint(
      concat(lit(seed + ":" + tag + ":"), col(idCol).cast("string")))
    def uniform(tag: String) = fp(tag).cast("double") / lit(2147483647.0)
    val len = length(col(textCol))
    val c1 = floor(uniform("c1") * (len + lit(1)).cast("double")).cast("int")
    val c2 = floor(uniform("c2") * (len + lit(1)).cast("double")).cast("int")
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val psm = concat(lit("<PRE> "), col(textCol).substr(lit(1), lo),
      lit(" <SUF> "), col(textCol).substr(hi + lit(1), len - hi),
      lit(" <MID> "), col(textCol).substr(lo + lit(1), hi - lo))
    df.withColumn("fim", pmod(fp("gate"), lit(100)) < lit(ratePct))
      .withColumn("fim_text", when(col("fim"), psm).otherwise(col(textCol)))
  }

  /** T5-style span corruption (Raffel et al., "Exploring the Limits of
    * Transfer Learning with a Unified Text-to-Text Transformer", JMLR'20):
    * ~`ratePct`% of each document's tokens are masked in spans of mean
    * `meanSpan`, each span replaced by a numbered sentinel `<Xi>` in the
    * input while the target lists each sentinel followed by the tokens
    * it hid — the denoising-objective example constructor.
    *
    * Deterministic layout (the spirit of the paper's random spans, made
    * replayable): span count k = round-down of corrupted-token budget /
    * meanSpan; the token range is cut into k equal segments and span i
    * sits inside segment i at an offset drawn from a hash uniform — so
    * spans can't overlap BY CONSTRUCTION, every position's fate is a
    * pure function of (seed, id, n), and the oracle replays each byte.
    * All counts are integer arithmetic (`DIV`/`%`); the only double is
    * the offset uniform. Docs under `minTokens` pass through untouched
    * (nothing to corrupt), flagged `corrupted = false`.
    *
    * Per-row array transforms only — scan speed, zero shuffle, any
    * corpus size. Adds `corrupted`, `n_spans`, `input_text`,
    * `target_text`. */
  def spanCorrupt(df: DataFrame, textCol: String, idCol: String, seed: String,
      ratePct: Int = 15, meanSpan: Int = 3, minTokens: Int = 8): DataFrame = {
    require(ratePct > 0 && ratePct <= 50, s"ratePct must be in 1..50, got $ratePct")
    require(meanSpan > 0, s"meanSpan must be positive, got $meanSpan")
    require(minTokens > 2 * meanSpan,
      s"minTokens must exceed 2*meanSpan, got $minTokens vs $meanSpan")
    val sent = (i: Column) => concat(lit("<X"), i.cast("string"), lit(">"))
    val base = df
      .withColumn("_sp", graft.functions.TextFunctions.tokens(col(textCol)))
      .withColumn("_n", size(col("_sp")))
      .withColumn("_c", greatest(lit(1), expr(s"(_n * $ratePct) DIV 100")))
      .withColumn("_k", greatest(lit(1), expr(s"_c DIV $meanSpan")))
      .withColumn("_seg", expr("_n DIV _k"))
    // span i: length = c DIV k (+1 for the first c % k spans, ≤ seg);
    // offset inside segment i from the portable-fingerprint uniform
    val spans = transform(sequence(lit(0), col("_k") - 1), i => {
      val len = least(
        expr("_c DIV _k") + when(i < expr("_c % _k"), lit(1)).otherwise(lit(0)),
        col("_seg"))
      val u = Sampling.portableUniformFingerprint(
          concat(lit(seed + ":"), i.cast("string"), lit(":"), col(idCol).cast("string")))
        .cast("double") / lit(2147483647.0)
      val off = floor(u * (col("_seg") - len + lit(1)).cast("double")).cast("int")
      struct(i.as("i"), len.as("len"), off.as("off"))
    })
    val segStart = (s: Column) => s("i") * col("_seg")
    val inputArr = concat(
      flatten(transform(col("_spans"), s => concat(
        slice(col("_sp"), segStart(s) + lit(1), s("off")),
        array(sent(s("i"))),
        slice(col("_sp"), segStart(s) + s("off") + s("len") + lit(1),
          col("_seg") - s("off") - s("len"))))),
      slice(col("_sp"), col("_k") * col("_seg") + lit(1),
        col("_n") - col("_k") * col("_seg")))
    val targetArr = flatten(transform(col("_spans"), s => concat(
      array(sent(s("i"))),
      slice(col("_sp"), segStart(s) + s("off") + lit(1), s("len")))))
    base
      .withColumn("_spans", spans)
      .withColumn("corrupted", col("_n") >= lit(minTokens))
      .withColumn("n_spans",
        when(col("corrupted"), col("_k")).otherwise(lit(0)).cast("long"))
      .withColumn("input_text",
        when(col("corrupted"), concat_ws(" ", inputArr)).otherwise(col(textCol)))
      .withColumn("target_text",
        when(col("corrupted"), concat_ws(" ", targetArr)).otherwise(lit("")))
      .drop("_sp", "_n", "_c", "_k", "_seg", "_spans")
  }
}
