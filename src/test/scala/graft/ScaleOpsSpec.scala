package graft

import org.apache.spark.sql.functions._

import graft.io.LayerIO
import graft.operators.{AsOfJoin, Sessionize, Skew}

/** Scale-path operators: as-of join semantics, sessionization, salted
  * skew-join equivalence, bucketed join shuffle elimination. */
class ScaleOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join attaches the latest right row at-or-before, per key") {
    val left = Seq(
      (1L, 10L, t("2024-01-01 10:00:00")),
      (2L, 10L, t("2024-01-01 12:00:00")),
      (3L, 20L, t("2024-01-01 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, t("2024-01-01 09:30:00"), 1.0),
      (10L, t("2024-01-01 11:00:00"), 2.0),
      (10L, t("2024-01-01 12:00:00"), 3.0), // equal ts → inclusive match
      (20L, t("2024-01-01 10:00:00"), 9.0)) // after left's only row
      .toDF("user_id", "ts", "v")
    val got = AsOfJoin(left, right, "user_id", "ts", Seq("v"))
      .select("event_id", "asof_v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === Some(1.0))  // latest ≤ 10:00 is 09:30
    assert(got(2L) === Some(3.0))  // equal timestamp matches (inclusive)
    assert(got(3L) === None)       // nothing at-or-before → null
  }

  test("sessionize splits on gaps > threshold") {
    val ev = Seq(
      (1L, 5L, t("2024-01-01 10:00:00")),
      (2L, 5L, t("2024-01-01 10:10:00")),  // same session (10 min)
      (3L, 5L, t("2024-01-01 11:00:00")),  // new session (50 min gap)
      (4L, 6L, t("2024-01-01 10:00:00")))  // separate user
      .toDF("event_id", "user_id", "ts")
    val s = Sessionize.sessionStats(ev, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)].collect()
    assert(s.toSeq === Seq((5L, 0L, 2L), (5L, 1L, 1L), (6L, 0L, 1L)))
  }

  test("bucketized range join equals the naive theta join") {
    val points = Seq(
      (1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-02 00:00:00")),
      (3L, t("2024-01-05 23:59:59")), (4L, t("2024-02-01 00:00:00")))
      .toDF("pt_id", "ts")
    val intervals = Seq(
      (100L, t("2024-01-01 00:00:00"), t("2024-01-03 00:00:00")),
      (200L, t("2024-01-05 00:00:00"), t("2024-01-06 00:00:00")),
      (300L, t("2024-03-01 00:00:00"), t("2024-03-02 00:00:00")))
      .toDF("iv_id", "s", "e")
    val bucketized = graft.operators.RangeJoin
      .pointInInterval(points, "ts", intervals, "s", "e", bucketUs = 3600L * 1000000L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, col("ts") >= col("s") && col("ts") < col("e"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(bucketized === naive)
    assert(naive === Set((1L, 100L), (2L, 100L), (3L, 200L))) // 4 matches nothing
  }

  test("salted join equals plain join on skewed data") {
    // 90% of rows share one hot key
    val large = spark.range(10000)
      .select((when(col("id") % 10 < 9, 1L).otherwise(col("id"))).as("k"), col("id").as("payload"))
    val small = Seq((1L, "hot"), (42L, "cold"), (7777L, "x")).toDF("k", "name")
    val plain = large.join(small, "k")
    val salted = Skew.saltedJoin(large, small, "k", factor = 8, saltSource = "payload")
    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted.select(plain.columns.map(col): _*)).count() === 0)
  }

  test("salted LEFT join equals plain left join; unmatched rows survive exactly once") {
    // hot key 1 matches; keys 5000+ miss the dim entirely — each
    // unmatched large row must appear EXACTLY once (not once per salt)
    val large = spark.range(10000)
      .select((when(col("id") % 10 < 9, 1L).otherwise(col("id") + 5000L)).as("k"),
        col("id").as("payload"))
    val small = Seq((1L, "hot"), (42L, "cold")).toDF("k", "name")
    val plain = large.join(small, Seq("k"), "left")
    val salted = Skew.saltedJoin(large, small, "k", factor = 8,
      saltSource = "payload", joinType = "left")
    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted.select(plain.columns.map(col): _*)).count() === 0)
    assert(salted.filter(col("name").isNull).count() ===
      plain.filter(col("name").isNull).count())
  }

  test("salted join refuses right/full join types (salt would duplicate unmatched dim rows)") {
    val large = spark.range(10).select(col("id").as("k"), col("id").as("payload"))
    val small = Seq((1L, "x")).toDF("k", "name")
    for (jt <- Seq("right", "full", "full_outer"))
      assertThrows[IllegalArgumentException] {
        Skew.saltedJoin(large, small, "k", factor = 4,
          saltSource = "payload", joinType = jt)
      }
  }

  test("bucketed tables join without a shuffle exchange") {
    val a = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
    LayerIO.writeBucketed(a, "bkt_a", "k", buckets = 8)
    LayerIO.writeBucketed(b, "bkt_b", "k", buckets = 8)
    // force the SMJ path (the tables are tiny, so the planner would
    // otherwise broadcast and never consult bucketing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = LayerIO.readTable(spark, "bkt_a")
        .join(LayerIO.readTable(spark, "bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
