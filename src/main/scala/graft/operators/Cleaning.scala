package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C4-style line-level corpus cleaning (Raffel et al., "Exploring the
  * Limits of Transfer Learning with a Unified Text-to-Text Transformer",
  * JMLR'20 §2.2): the published recipe behind the C4 corpus, applied at
  * line grain over `'\n'`-separated page text —
  *
  *   1. keep only lines ending in terminal punctuation (`.` `!` `?` `"`);
  *   2. keep only lines with at least `minWords` words;
  *   3. remove every line that appears more than once in the corpus,
  *      keeping its FIRST occurrence (boilerplate — navigation chrome,
  *      cookie banners, license footers — repeats across pages);
  *   4. keep only pages retaining at least `minKeptLines` lines.
  *
  * Rules 1/2 are per-row scans. Rule 3 is the one shuffle: a ranking
  * window keyed on the line's 128-bit digest (never the raw line — the
  * t05 exact-dedup discipline) with the deterministic first-occurrence
  * order `(doc_id, line_idx)`. Rule 4 is a per-page count over the
  * already-shuffled rows. At 100 TB the digest window is a single
  * hash-exchange of (digest, ids, flags)-width rows; page reassembly
  * ([[cleanPages]]) adds one doc_id-keyed aggregation.
  */
object Cleaning {

  /** Per-line verdict frame: one row per line of every page, carrying
    * the rule-by-rule flags —
    * `ends_terminal` (rule 1), `enough_words`/`n_words` (rule 2),
    * `line_pass` (1 ∧ 2), `line_kept` (pass ∧ first occurrence, rule 3),
    * and `page_kept` (rule 4 verdict of the line's page). Deterministic
    * total order `(doc_id, line_idx)`. */
  def lineVerdicts(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minWords: Int = 5,
      minKeptLines: Int = 3): DataFrame = {
    val lines = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
      .withColumn("n_words",
        size(filter(split(col("line"), " "), t => t =!= lit(""))).cast("long"))
      .withColumn("ends_terminal",
        substring(col("line"), -1, 1).isin(".", "!", "?", "\""))
      .withColumn("enough_words", col("n_words") >= minWords)
      .withColumn("line_pass", col("ends_terminal") && col("enough_words"))
    // Rule 3: first-occurrence rank per distinct PASSING line. Failing
    // lines ride along under their own digest partitions (their rank is
    // never consulted), so one window pass covers both; the partition
    // key is the digest, bounding shuffle-row width regardless of line
    // length.
    val rank = row_number().over(
      Window.partitionBy(col("line_pass"), md5(col("line")))
        .orderBy(col("doc_id"), col("line_idx")))
    val kept = lines
      .withColumn("line_kept", col("line_pass") && rank === 1)
    kept
      .withColumn("page_kept",
        sum(col("line_kept").cast("long"))
          .over(Window.partitionBy(col("doc_id"))) >= minKeptLines)
      .select("doc_id", "line_idx", "line", "n_words", "ends_terminal",
        "enough_words", "line_pass", "line_kept", "page_kept")
      .orderBy(col("doc_id"), col("line_idx"))
  }

  /** The cleaned corpus: kept pages reassembled from their kept lines in
    * original order (`'\n'`-joined), with the retained-line count. One
    * doc_id-keyed aggregation over [[lineVerdicts]]'s output; the
    * in-group line order is restored by an array sort on `line_idx`, not
    * a global sort. */
  def cleanPages(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minWords: Int = 5,
      minKeptLines: Int = 3): DataFrame =
    lineVerdicts(docs, textCol, idCol, minWords, minKeptLines)
      .filter(col("line_kept") && col("page_kept"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept_lines"),
        array_join(
          transform(array_sort(collect_list(struct(col("line_idx"), col("line")))),
            s => s.getField("line")), "\n").as("clean_text"))
      .orderBy(col("doc_id"))

  /** Email pattern shared by [[piiScan]] and its oracle — restricted to
    * the Java-regex ∩ RE2 common subset (no lookaround, no backrefs,
    * greedy quantifiers only) so Spark and DuckDB match identically. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone pattern (NNN-NNN-NNNN with word boundaries), same subset. */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII scan + redaction — the privacy pass every LLM training-data
    * pipeline runs before export (the C4/Gopher pipelines drop or mask
    * documents with detectable personal identifiers): counts email and
    * phone matches per document and rewrites the text with `<EMAIL>` /
    * `<PHONE>` placeholders, emails masked first (the composition order
    * is part of the contract — a phone-shaped digit run inside an
    * already-masked email must not double-count). Pure per-row regex
    * work over codegen'd `regexp_extract_all` / `regexp_replace`: no
    * shuffle at all, the ideal 100 TB shape (a masking pass is
    * scan-bound, and this plan IS one scan).
    *
    * Output: (doc_id, n_emails, n_phones, masked), ascending doc_id —
    * the masked text itself is gated byte-exact (the t43 discipline),
    * not just the counts. */
  def piiScan(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("_t"))
      // regexp_extract_all/regexp_replace take the pattern as a literal
      // Column/String, NOT through the SQL parser — an expr() string
      // literal would eat the regex backslashes (the '\d' → 'd' parser
      // trap) and silently diverge from the oracle's RE2 read
      .withColumn("n_emails",
        size(regexp_extract_all(col("_t"), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("_m1", regexp_replace(col("_t"), EmailRe, "<EMAIL>"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("_m1"), lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("masked", regexp_replace(col("_m1"), PhoneRe, "<PHONE>"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("masked"))
      .orderBy(col("doc_id"))
}
