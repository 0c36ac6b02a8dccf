package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The bench status line must stay machine-readable at any suite size:
  * the driver captures only the last ~2000 chars of stdout, so the LAST
  * printed line has to fit whole (BENCH_r13.json recorded `parsed:
  * null` when the 162-query map outgrew every map-bearing tier and
  * truncated mid-JSON). These tests drive Bench.statusLines at the
  * current suite size and at a simulated 300-query size and assert the
  * final line parses and carries the summary fields regardless. */
class BenchLineSpec extends AnyFunSuite {

  private def summaryOf(n: Int): Bench.Summary = {
    // deterministic synthetic suite: ids shaped like the real ones
    // (q01_agg, t09_minhash, ...) so shortId exercises its real path
    val names = (1 to n).map(i => f"q$i%03d_synthetic_query_name_$i")
    val results = names.map(nm => nm -> (0.3 + (nm.length % 7) * 0.5)).toMap
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

  private def checkFinal(lines: Seq[String]): JValue = {
    val fin = lines.last
    assert(fin.length <= 1950,
      s"final status line must fit the ~2000-char tail capture, got ${fin.length}")
    val json = JsonMethods.parse(fin)
    for (field <- Seq("metric", "value", "unit", "runs", "run_totals",
        "gc_totals", "repair", "sf"))
      assert(json \ field !== JNothing, s"final line must carry '$field'")
    json
  }

  test("small suite: one line, map included, parseable") {
    val lines = Bench.statusLines(summaryOf(20))
    assert(lines.size === 1)
    val json = checkFinal(lines)
    assert((json \ "queries") !== JNothing)
  }

  test("162-query suite (current size): final line parses and fits") {
    val lines = Bench.statusLines(summaryOf(162))
    val json = checkFinal(lines)
    // whichever tier won, the summary fields are present; if the map was
    // dropped, the preceding line must carry the complete per-query map
    if ((json \ "queries") == JNothing) {
      assert(lines.size === 2)
      val full = JsonMethods.parse(lines.head)
      val JObject(qs) = (full \ "queries"): @unchecked
      assert(qs.size === 162, "preceding line carries the complete map")
    }
  }

  test("simulated 300-query suite: terminal tier drops the map, stays parseable") {
    val lines = Bench.statusLines(summaryOf(300))
    assert(lines.size === 2, "oversized suite emits map line + summary line")
    val json = checkFinal(lines)
    assert((json \ "queries") === JNothing,
      "terminal tier is queries-free so its length is bounded")
    val full = JsonMethods.parse(lines.head)
    val JObject(qs) = (full \ "queries"): @unchecked
    assert(qs.size === 300, "the full per-query record precedes the summary")
    // the summary's numbers agree with the full line's
    assert((json \ "value") === (full \ "value"))
    assert((json \ "run_totals") === (full \ "run_totals"))
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
    val json = checkFinal(Bench.statusLines(s))
    val JObject(rep) = (json \ "repair"): @unchecked
    assert(rep.size === 5, "repair map is capped at 5 on the compact tiers")
    assert((json \ "flagged_n") === JInt(8), "exact flagged count travels alongside")
    // and when nothing is truncated the field is absent (no noise)
    val small = summaryOf(20)
    val jsonSmall = checkFinal(Bench.statusLines(small))
    assert((jsonSmall \ "flagged_n") === JNothing)
  }

  test("terminal summary stays bounded even with a large failed list") {
    val base = summaryOf(300)
    val s = base.copy(failed = (1 to 50).map(i => f"x$i%03d_failed_query"))
    val lines = Bench.statusLines(s)
    val json = checkFinal(lines)
    val JArray(shown) = (json \ "failed"): @unchecked
    assert(shown.size <= 10, "failed list is capped in the status line")
    assert((json \ "failed_n") === JInt(50), "exact count travels alongside")
  }
}
