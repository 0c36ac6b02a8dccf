package graft

import org.apache.spark.sql.functions._

import graft.operators.Cleaning

/** C4-style line-level cleaning (Raffel et al. JMLR'20 §2.2) over real
  * newline-separated pages: each rule exercised with planted fixtures —
  * terminal punctuation, word-count floor, corpus-wide first-occurrence
  * line dedup (boilerplate), page floor, and reassembly. */
class CleaningSpec extends SparkTestBase {
  import spark.implicits._

  private val boiler = "accept all cookies to continue browsing this site."
  private val pages = Seq(
    // doc 1: three good lines + boilerplate (first occurrence) → kept
    (1L, Seq(
      "the first substantive sentence carries plenty of words.",
      boiler,
      "another complete thought with enough words to pass!",
      "does this line also carry enough words?").mkString("\n")),
    // doc 2: boilerplate repeats (dropped), "no terminal punctuation" and
    // short lines fail their rules → only one kept line → page dropped
    (2L, Seq(
      boiler,
      "this line simply never terminates properly",
      "too short.",
      "the only line of page two that survives every rule.").mkString("\n")),
    // doc 3: three good lines, one of them a dup of doc 1's → page dropped
    // at the 3-kept floor (2 kept)
    (3L, Seq(
      "another complete thought with enough words to pass!",
      "a third page sentence that is perfectly fine.",
      "one more acceptable sentence to round things out.").mkString("\n")))
    .toDF("doc_id", "text")

  test("per-line verdicts apply each C4 rule") {
    val v = Cleaning.lineVerdicts(pages, minWords = 5, minKeptLines = 3)
      .select("doc_id", "line_idx", "line_pass", "line_kept", "page_kept")
      .as[(Long, Int, Boolean, Boolean, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(v((1L, 0)) === ((true, true, true)))
    assert(v((1L, 1)) === ((true, true, true)), "first boilerplate occurrence keeps")
    assert(v((2L, 0)) === ((true, false, false)), "repeated boilerplate drops")
    assert(v((2L, 1)) === ((false, false, false)), "no terminal punctuation")
    assert(v((2L, 2)) === ((false, false, false)), "under the word floor")
    assert(v((2L, 3)) === ((true, true, false)), "kept line on a dropped page")
    assert(v((3L, 0)) === ((true, false, false)), "cross-page dup of doc 1's line")
    assert(v((3L, 1)) === ((true, true, false)))
  }

  test("cleanPages reassembles kept lines in order for kept pages only") {
    val out = Cleaning.cleanPages(pages, minWords = 5, minKeptLines = 3)
      .as[(Long, Long, String)].collect()
    assert(out.map(_._1).toSeq === Seq(1L), "only page 1 clears the 3-kept floor")
    val (_, n, text) = out.head
    assert(n === 4L)
    assert(text === Seq(
      "the first substantive sentence carries plenty of words.",
      boiler,
      "another complete thought with enough words to pass!",
      "does this line also carry enough words?").mkString("\n"),
      "kept lines rejoin in original order")
  }

  test("a line ending in a closing quote passes the punctuation rule") {
    val q = Seq((9L, "he said \"this is a quoted line with enough words\"\n" +
      "and this second line has no ending either")).toDF("doc_id", "text")
    val v = Cleaning.lineVerdicts(q, minWords = 5, minKeptLines = 1)
      .select("line_idx", "ends_terminal").as[(Int, Boolean)].collect().toMap
    assert(v(0) === true)
    assert(v(1) === false)
  }

  test("piiScan counts and masks emails then phones; boundaries and order pinned") {
    val docs = Seq(
      (1L, "mail a.b-c_1@ex-ample.co.uk or x@y.io now"),     // two emails
      (2L, "call 555-123-4567 or 555-000-1111 today"),       // two phones
      (3L, "digits 12555-123-45678 touch the boundary"),     // \b blocks both sides
      (4L, "mixed u@v.org then 555-999-0000"),
      (5L, "nothing to find here")).toDF("doc_id", "text")
    val out = Cleaning.piiScan(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._1 === 2L && out(1L)._2 === 0L)
    assert(out(1L)._3 === "mail <EMAIL> or <EMAIL> now")
    assert(out(2L) === ((0L, 2L, "call <PHONE> or <PHONE> today")))
    // 12555-123-45678: no word boundary before 555 or after 4567 —
    // must NOT be masked (the \b contract both regex engines share)
    assert(out(3L) === ((0L, 0L, "digits 12555-123-45678 touch the boundary")))
    assert(out(4L) === ((1L, 1L, "mixed <EMAIL> then <PHONE>")))
    assert(out(5L) === ((0L, 0L, "nothing to find here")))
  }
}
