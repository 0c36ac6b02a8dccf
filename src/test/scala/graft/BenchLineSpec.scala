package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The bench status line must stay machine-readable at any suite size:
  * the driver captures only the last ~2000 chars of ALL stdout, so
  * EVERY line statusLines returns shares one window (with sbt's
  * trailing "[success] ..." line). BENCH_r13 recorded `parsed: null`
  * when the 162-query map truncated mid-JSON; BENCH_r15 lost the map's
  * HEAD (m01–m13, p01–p20) when the full-precision map line + summary
  * outgrew the window — both are the same bug, budgeting one line at a
  * time. These tests drive Bench.statusLines across suite sizes and
  * assert the COMBINED output fits the budget while the final line
  * parses and the per-query record survives (inline, compact, or via
  * the bench_full.json sidecar). */
class BenchLineSpec extends AnyFunSuite {

  private def summaryOf(n: Int): Bench.Summary = {
    // deterministic synthetic suite: ids shaped like the real ones
    // (q01_agg, t09_minhash, ...) so shortId exercises its real path,
    // and a value distribution shaped like the real one (BENCH_r15:
    // ~2/3 of queries under 1 s → 2-digit centiseconds, a long tail of
    // multi-second entries, one >10 s) so the byte-budget math the
    // tiers make is exercised against realistic line lengths
    val names = (1 to n).map(i => f"q$i%03d_synthetic_query_name_$i")
    val results = names.zipWithIndex.map { case (nm, i) =>
      nm -> (if (i % 50 == 49) 12.34 // the t34/q34-style tail
             else if (i % 3 == 2) 1.0 + (i % 7) * 0.5 // 1–4 s band
             else 0.13 + (i % 17) * 0.05) // sub-second majority
    }.toMap
    val phases = names.take(6)
      .map(nm => nm -> Map("index_build" -> 1.25, "probe" -> 0.75)).toMap
    val flagged = names.take(6)
    Bench.Summary(
      results = results,
      phaseResults = phases,
      runTotals = Seq(results.values.sum * 1.3, results.values.sum),
      gcTotals = Seq(1.41, 0.93),
      failed = names.slice(6, 9),
      flagged = flagged,
      repair = flagged.map(_ -> 1.23).toMap,
      repairGc = flagged.map(_ -> 0.01).toMap,
      repairHeap = flagged.map(_ -> 512L).toMap,
      runsPerQuery = 2,
      sfDir = "/root/testdata/sf0.1")
  }

  /** Joint-budget + final-line-parses invariant, every suite size. */
  private def checkLines(lines: Seq[String]): JValue = {
    val combined = lines.mkString("\n").length
    assert(combined <= Bench.TailBudget,
      s"ALL final lines share the ~2000-char tail capture, got $combined")
    val json = JsonMethods.parse(lines.last)
    for (field <- Seq("metric", "value", "unit", "runs", "run_totals",
        "gc_totals", "repair", "sf"))
      assert(json \ field !== JNothing, s"final line must carry '$field'")
    json
  }

  /** Parses a compact centisecond map line into name→cs pairs. */
  private def parseCs(line: String): Map[String, Long] = {
    val json = JsonMethods.parse(line)
    assert((json \ "metric") === JString("queries_cs"))
    val JString(q) = (json \ "q"): @unchecked
    q.split(" ").map { item =>
      val Array(k, v) = item.split(":")
      k -> v.toLong
    }.toMap
  }

  test("small suite: one line, map included, parseable") {
    val lines = Bench.statusLines(summaryOf(20))
    assert(lines.size === 1)
    val json = checkLines(lines)
    assert((json \ "queries") !== JNothing)
  }

  test("183-query suite (current size): EVERY per-query value survives the window") {
    // r15's failure class at the current suite size: the full-precision
    // map cannot share the window with the summary, so the compact
    // centisecond tier must win — and must carry every entry
    val s = summaryOf(183)
    val lines = Bench.statusLines(s)
    val json = checkLines(lines)
    assert((json \ "queries") === JNothing && lines.size === 2,
      s"at 183 queries the compact-map two-line form must win: $lines")
    val cs = parseCs(lines.head)
    assert(cs.size === 183, "compact line carries the complete map")
    // values are exact centisecond roundings of the results
    s.results.foreach { case (name, v) =>
      assert(cs(Bench.shortId(name)) === math.rint(v * 100).toLong)
    }
  }

  test("200-query suite: bounded output; per-query record survives inline or via sidecar") {
    val s = summaryOf(200)
    val lines = Bench.statusLines(s)
    checkLines(lines)
    if (lines.size == 2) assert(parseCs(lines.head).size === 200)
    // either way the sidecar carries everything
    val full = JsonMethods.parse(Bench.fullJson(s))
    val JObject(qs) = (full \ "queries"): @unchecked
    assert(qs.size === 200)
  }

  test("oversized suites (300, 1000): summary stays bounded; sidecar carries the record") {
    for (n <- Seq(300, 1000)) {
      val s = summaryOf(n)
      val lines = Bench.statusLines(s)
      checkLines(lines)
      // the full sidecar record is uncapped and parseable at any size
      val full = JsonMethods.parse(Bench.fullJson(s))
      val JObject(qs) = (full \ "queries"): @unchecked
      assert(qs.size === n)
    }
  }

  test("fullJson (bench_full.json sidecar) is uncapped: identity keys, full failed list") {
    val base = summaryOf(50)
    val s = base.copy(failed = (1 to 30).map(i => f"x$i%03d_failed_query"))
    val full = JsonMethods.parse(Bench.fullJson(s))
    val JObject(qs) = (full \ "queries"): @unchecked
    assert(qs.exists(_._1.contains("_synthetic_query_name_")),
      "sidecar uses full query names, not shortIds")
    val JArray(failedList) = (full \ "failed"): @unchecked
    assert(failedList.size === 30, "sidecar failed list is uncapped")
  }

  test("capped repair list carries flagged_n so a 6+-flag round is visible") {
    // 8 flagged queries at a suite size that forces the repairCap=5
    // tiers: the artifact must say flagged_n:8, not silently show 5
    val base = summaryOf(300)
    val names = (1 to 8).map(i => f"q$i%03d_synthetic_query_name_$i")
    val s = base.copy(
      flagged = names,
      repair = names.map(_ -> 1.23).toMap,
      repairGc = names.map(_ -> 0.01).toMap,
      repairHeap = names.map(_ -> 512L).toMap)
    val json = checkLines(Bench.statusLines(s))
    val JObject(rep) = (json \ "repair"): @unchecked
    assert(rep.size === 5, "repair map is capped at 5 on the compact tiers")
    assert((json \ "flagged_n") === JInt(8), "exact flagged count travels alongside")
    // and when nothing is truncated the field is absent (no noise)
    val small = summaryOf(20)
    val jsonSmall = checkLines(Bench.statusLines(small))
    assert((jsonSmall \ "flagged_n") === JNothing)
  }

  test("terminal summary stays bounded even with a large failed list") {
    val base = summaryOf(300)
    val s = base.copy(failed = (1 to 50).map(i => f"x$i%03d_failed_query"))
    val lines = Bench.statusLines(s)
    val json = checkLines(lines)
    val JArray(shown) = (json \ "failed"): @unchecked
    assert(shown.size <= 10, "failed list is capped in the status line")
    assert((json \ "failed_n") === JInt(50), "exact count travels alongside")
  }
}
