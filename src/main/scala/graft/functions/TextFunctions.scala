package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis for large-scale training-data pipelines:
  * tokenization, shingling, quality scoring, language-ID heuristics.
  *
  * Everything here is built-in-function composition (codegen'd, no UDFs) so
  * it runs at scan speed and pushes through Catalyst untouched. Each helper
  * has a mechanical DuckDB mirror used by the oracle queries in
  * [[graft.queries.Text]].
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped (parity: DuckDB
    * `list_filter(str_split(text,' '), t -> t <> '')`). */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= lit(""))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Tokens split on ANY whitespace run (`\s+`), empties dropped — for
    * operators whose downstream machinery cannot tolerate tab/newline
    * inside a token (the unigram piece-spec wire format reserves both as
    * separators). Identical to [[tokens]] on single-space text, so
    * oracles mirroring `str_split(text, ' ')` stay exact on the fixture;
    * the general DuckDB mirror is `regexp_split_to_array(text, '\s+')`. */
  def wsTokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  /** BPE-ish subword segmentation: letter runs or single non-letter,
    * non-space characters — a cheap proxy for LLM token counting. */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit("[a-z]+|[^a-z\\s]"), lit(0))

  /** Word n-gram shingles (distinct), the unit for Jaccard similarity.
    * Documents shorter than n words get an empty set (guard needed:
    * Spark's sequence(1,0) would count *down*, unlike DuckDB's range). */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(ngramsAll(toks, n))

  /** Word n-grams in document order with duplicates KEPT — the unit the
    * repetition filters count over ([[shingles]] is the distinct variant
    * for Jaccard). Same short-document guard as [[shingles]]. */
  def ngramsAll(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** |A∩B| / |A∪B| on pre-distinct shingle arrays; exact integer counts so
    * the double division is bit-identical cross-engine. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  val StopwordList: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordHits(toks: Column): Column =
    size(filter(toks, t => t.isInCollection(StopwordList)))

  /** Fraction of characters that are neither lowercase letters nor spaces
    * (punctuation/digit density — a classic quality signal). */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[a-z ]", "")).cast("double") / length(c)

  /** Composite quality score in [0,1] from length, stopword, and
    * punctuation signals — ONE definition of the arithmetic, mirrored
    * token-for-token by the SQL side (graft.queries.Text.qualitySql) so
    * per-row doubles match bit-for-bit cross-engine. */
  def qualityScore(nTokens: Column, stopRatio: Column, punctRatio: Column): Column =
    least(lit(1.0), nTokens / lit(200.0)) * 0.5 +
      least(lit(1.0), stopRatio * 4.0) * 0.3 +
      (lit(1.0) - punctRatio) * 0.2

  /** PII-style scrubbing patterns for training-data pipelines: applied in
    * order, each replaces matches with a typed placeholder. Simple
    * character-class regexes only, so Java and RE2-style engines agree. */
  val RedactionPatterns: Seq[(String, String)] = Seq(
    "(?i)[a-z0-9.]+@[a-z0-9.]+" -> "<EMAIL>", // (?i): works in Java and RE2
    "[0-9]+(-[0-9]+)+" -> "<PHONE>",
    "[0-9]{4,}" -> "<NUM>")

  /** Applies [[RedactionPatterns]] left to right. */
  def redact(c: Column): Column =
    RedactionPatterns.foldLeft(c) { case (acc, (pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }

  /** Linkable-identifier pattern for [[pseudonymizeString]]: emails and
    * dashed phone numbers as ONE alternation, so replacement is a single
    * left-to-right pass with per-match type dispatch. Explicit character
    * classes and a non-capturing group only — Java regex and RE2
    * (DuckDB) agree on every construct here, including leftmost-first
    * alternation, which keeps the oracle replay exact. The bare-number
    * pattern is deliberately NOT pseudonymized: a standalone number is
    * not a cross-document linkable identity. */
  val PseudonymizePattern: String =
    "[a-zA-Z0-9.]+@[a-zA-Z0-9.]+|[0-9]+(?:-[0-9]+)+"

  // surrogate keys derive from the engine's ONE portable fold
  // (Fold31.fold ≡ Sampling.portableFingerprint ≡ the oracle's foldSql)
  private def portableFold(s: String): Long =
    Fold31.fold(org.apache.spark.unsafe.types.UTF8String.fromString(s))

  /** CONSISTENT pseudonymization (deterministic tokenization): every
    * match of [[PseudonymizePattern]] is replaced by a surrogate derived
    * from the match's own content hash — the same email anywhere in a
    * 100 TB corpus maps to the SAME surrogate, so cross-document link
    * structure (co-occurrence, reply graphs, dedup keys) survives
    * de-identification, unlike [[redact]]'s type tags which collapse
    * every entity of a type into one token. This is the standard
    * "pseudonymize" operator of privacy pipelines (deterministic hash
    * surrogates). Surrogates: email → `user<fold>@redacted.example`,
    * phone → `555-<fold>`, where `<fold>` is the FULL 31-bit portable
    * fold (ADVICE r16: the earlier mod-1e6/1e4 folds collided distinct
    * identities at the birthday bound — ~1.2k emails / ~120 phones —
    * creating exactly the false cross-document links the operator
    * exists to prevent; the full 31-bit space pushes the bound to
    * ~54k identities, and a collision now degrades linkage rather
    * than silently fabricating it). Pure function of the input
    * string — distributable at scan speed, no lookup table to build,
    * ship, or leak. Privacy caveat: a keyless content hash is NOT
    * irreversible against a dictionary attack over candidate
    * identifiers — true irreversibility needs a keyed digest (HMAC
    * with a secret salt, the token-VAULT variant); this form's
    * guarantee is linkage-preserving de-identification, not
    * cryptographic anonymization.
    *
    * NOT idempotent by design: surrogates are format-preserving (an
    * email stays email-shaped so downstream parsers keep working),
    * so a SECOND pseudonymize pass re-matches and re-maps them — run
    * once per corpus, like any tokenization step. */
  private lazy val pseudonymizeCompiled =
    java.util.regex.Pattern.compile(PseudonymizePattern)

  def pseudonymizeString(s: String): String = {
    val m = pseudonymizeCompiled.matcher(s)
    val out = new java.lang.StringBuilder(s.length)
    var last = 0
    while (m.find()) {
      out.append(s, last, m.start())
      val hit = m.group()
      if (hit.indexOf('@') >= 0)
        out.append("user").append(portableFold(hit)).append("@redacted.example")
      else
        out.append("555-").append(portableFold(hit))
      last = m.end()
    }
    out.append(s, last, s.length)
    out.toString
  }

  /** Bounded public-suffix list for [[registeredDomain]] — the
    * SHAPE of the Public Suffix List algorithm (longest-matching
    * suffix wins; registered domain = one label left of it; unknown
    * TLDs fall back to the PSL default `*` rule) over a small
    * representative table covering the interesting cases: multi-label
    * country suffixes and private-registry entries (`github.io` —
    * every user site there is a distinct registrant, which is exactly
    * why naive last-two-labels grouping is wrong). Swappable for the
    * full published list; the ORDER here is irrelevant — matching
    * sorts by label count then length. Shared with the t78 oracle,
    * which inlines the same entries as literals (one definition). */
  val PublicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp", "com.br",
    "github.io", "gitlab.io", "web.app",
    "com", "org", "net", "io", "ai", "co", "dev", "app", "edu", "gov")

  /** Longest-match priority: more labels first, then longer, then
    * lexicographic (a total order so the matcher is deterministic). */
  private[graft] lazy val suffixesByPriority: Seq[String] =
    PublicSuffixes.sortBy(s => (-s.count(_ == '.'), -s.length, s))

  /** Registered (pay-level) domain of a URL: host extraction (scheme,
    * userinfo, port, path/query/fragment stripped; lowercased; trailing
    * dot dropped), then the longest matching public suffix from
    * [[PublicSuffixes]] plus ONE label. Returns null when no host or no
    * registrable label exists (a bare suffix like `github.io` is not a
    * registration). Unknown TLDs use the PSL default rule (last two
    * labels). Pure per-row string function — scan speed, no lookup
    * beyond the compile-time suffix table. */
  def registeredDomain(url: String): String = {
    var s = url.trim
    val schemeIdx = s.indexOf("://")
    if (schemeIdx >= 0) s = s.substring(schemeIdx + 3)
    val cut = s.indexWhere(c => c == '/' || c == '?' || c == '#')
    var host = if (cut >= 0) s.substring(0, cut) else s
    val at = host.lastIndexOf('@')
    if (at >= 0) host = host.substring(at + 1)
    val colon = host.indexOf(':')
    if (colon >= 0) host = host.substring(0, colon)
    host = host.toLowerCase(java.util.Locale.ROOT).stripSuffix(".")
    if (host.isEmpty || !host.contains('.')) return null
    for (sfx <- suffixesByPriority) {
      if (host.length > sfx.length + 1 && host.endsWith("." + sfx)) {
        val rest = host.substring(0, host.length - sfx.length - 1)
        val label = rest.substring(rest.lastIndexOf('.') + 1)
        if (label.isEmpty) return null
        return label + "." + sfx
      }
      if (host == sfx) return null
    }
    val parts = host.split('.')
    if (parts.length >= 2 && parts(parts.length - 1).nonEmpty &&
        parts(parts.length - 2).nonEmpty)
      parts(parts.length - 2) + "." + parts(parts.length - 1)
    else null
  }

  /** Language marker wordlists for the n-gram/stopword language-ID
    * heuristic. Tiny by design — the point is the *shape* (argmax of
    * per-language evidence computed in one pass), swappable for real
    * profiles. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "fr" -> Seq("le", "la", "les", "et"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "y"))
}
