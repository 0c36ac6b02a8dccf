package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics (q25/q47's operator): latest-at-or-before
  * matching, the strict (<) variant's exact-timestamp exclusion, left
  * behavior, and partitioning invariance. */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  // right side unique per (key, time) — the operator's documented
  // contract (q25/q47 pre-dedupe real data the same way)
  private val quotes = Seq(
    (1L, t("2024-01-01 10:00:00"), 10.0, 100L),
    (1L, t("2024-01-01 12:00:00"), 12.0, 102L),
    (2L, t("2024-01-01 18:00:00"), 20.0, 103L))
    .toDF("user_id", "ts", "q_value", "q_event_id")

  private val probes = Seq(
    (900L, 1L, t("2024-01-01 11:00:00"), 1.0), // between quotes -> 10:00
    (901L, 1L, t("2024-01-01 12:00:00"), 2.0), // exactly at a quote ts
    (902L, 1L, t("2024-01-01 15:00:00"), 3.0), // after all -> 12:00
    (903L, 2L, t("2024-01-01 09:00:00"), 4.0)) // before any quote -> null
    .toDF("event_id", "user_id", "ts", "value")

  test("inclusive (default): a quote AT the probe's instant is visible; left nulls") {
    val out = AsOfJoin(probes, quotes, "user_id", "ts",
        payload = Seq("q_value", "q_event_id"))
      .select("event_id", "asof_q_value", "asof_q_event_id")
      .as[(Long, Option[Double], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(900L) === ((Some(10.0), Some(100L))))
    assert(out(901L) === ((Some(12.0), Some(102L))), "same-ts quote is visible under >=")
    assert(out(902L) === ((Some(12.0), Some(102L))))
    assert(out(903L) === ((None, None)), "no prior quote keeps left nulls")
  }

  test("strict: a quote at the probe's exact ts is NOT visible (leakage lookback)") {
    val out = AsOfJoin(probes, quotes, "user_id", "ts",
        payload = Seq("q_value", "q_event_id"), strict = true)
      .select("event_id", "asof_q_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(901L) === Some(10.0),
      "at 12:00 sharp only the 10:00 quote may be seen")
    assert(out(900L) === Some(10.0))
    assert(out(902L) === Some(12.0))
    assert(out(903L) === None)
  }

  test("probe columns pass through untouched; results invariant under partitioning") {
    val out = AsOfJoin(probes, quotes, "user_id", "ts", payload = Seq("q_value"))
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts", "value", "asof_q_value"))
    assert(out.filter(col("event_id") === 900L).select("value").as[Double].head() === 1.0)
    val base = out.orderBy("event_id").collect().toSeq
    val again = AsOfJoin(probes.repartition(7), quotes.repartition(5),
        "user_id", "ts", payload = Seq("q_value"))
      .orderBy("event_id").collect().toSeq
    assert(again === base)
    val strictBase = AsOfJoin(probes, quotes, "user_id", "ts",
        payload = Seq("q_value"), strict = true)
      .orderBy("event_id").collect().toSeq
    val strictAgain = AsOfJoin(probes.repartition(3), quotes.repartition(2),
        "user_id", "ts", payload = Seq("q_value"), strict = true)
      .orderBy("event_id").collect().toSeq
    assert(strictAgain === strictBase)
  }
}
