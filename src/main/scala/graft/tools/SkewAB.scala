package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B for the q48 salted skew join (the tools/Scratch class
  * of utility — NOT part of the engine): builds a deliberately skewed
  * 100× events fixture — event ids offset per replica, user ids kept,
  * so after the q48 hot-key mapping ~75% of ALL rows land on ONE join
  * key — then times the plain join against [[graft.operators.Skew]]'s
  * explicit salt, printing per-variant whether AQE's skew split fired
  * (`skew=true` in the executed plan).
  *
  * What the runs established (sf0.1 × 100 = 10M rows, 74.7% hot):
  *
  *   - AQE's skew detector is denominated in compressed shuffle BYTES
  *     (`skewedPartitionThresholdInBytes`, 256 MB default, required in
  *     ADDITION to the ×5-over-median factor); join skew cost is
  *     denominated in ROWS per task. The narrow-payload query here
  *     (join_key + value, ~17.8k distinct values repeating 100× —
  *     lz4 food) compresses its 7.5M-row hot partition under even a
  *     16 MB threshold, so the detector never fires at ANY threshold
  *     tried, and one task eats 7.5M rows: plain 5.4–7.2 s vs salted
  *     ×16 1.7–2.3 s, ~3× — `aqe_split=false` on every plain variant.
  *   - Even where bytes cross the threshold, the rewrite additionally
  *     needs `forceOptimizeSkewedJoin` when the join feeds a
  *     different-key aggregation (the re-shuffle is counted against
  *     the split), refuses while either leg carries an explicit
  *     repartition (REPARTITION_BY_NUM origin), and only honored the
  *     overrides when they were set at session BUILD — the same
  *     spark.conf.set calls mid-session never produced a skew=true
  *     plan here.
  *   - `forceAqe` mode times the case where the split DOES fire (wide
  *     payload + 16 MB threshold + force + raw dim): plain-with-split
  *     1.28 s vs salted 1.08 s — AQE rescues what it can SEE nearly as
  *     well as the salt. The operator exists for everything the
  *     detector is blind to: compressible hot keys, hash joins,
  *     stream-side joins, known-ahead power-law keys.
  *
  * args: [srcDir=/root/testdata/sf0.1] [replicas=100] [reps=3] [forceAqe]
  */
object SkewAB {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(100)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val forceAqe = args.lift(3).contains("forceAqe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // at the scales where skew matters the dim side is past broadcast
      // range — with broadcast allowed the join never shuffles and
      // there is nothing to measure
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    val b1 =
      if (!forceAqe) b0
      else b0
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    val spark = graft.GraftSession.configure(b1).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fixture = "/tmp/graft_skewab/events"
    val repsDf = spark.range(replicas).select(col("id").as("_r"))
    graft.io.Corpus.events(spark, src)
      .crossJoin(broadcast(repsDf))
      .withColumn("event_id", col("event_id") + col("_r") * 100000000L)
      .drop("_r")
      .write.mode("overwrite").parquet(fixture)
    val ev = spark.read.parquet(fixture)
      .withColumn("join_key",
        when(col("user_id") % 4 =!= 0, lit(1L)).otherwise(col("user_id") + 1))
      .select("join_key", "event_id", "value")
    // raw read, NOT Corpus.customer: the Corpus input normalization is
    // an explicit repartition, whose REPARTITION_BY_NUM shuffle origin
    // under a join leg vetoes OptimizeSkewedJoin outright
    val dim = spark.read.parquet(s"$src/customer.parquet")
      .select(col("c_custkey").as("join_key"), col("c_mktsegment"))
    val total = ev.count()
    val hot = ev.filter(col("join_key") === 1L).count()
    println(f"[skew-ab] fixture rows=$total%,d hot-key rows=$hot%,d (${100.0 * hot / total}%.1f%%) forceAqe=$forceAqe")

    // q48's agg shape: the shuffle carries (join_key, value) — the
    // compressible narrow payload the detector goes blind on
    def aggNarrow(joined: DataFrame): DataFrame = joined
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.Num.dsum(col("value")).as("sum_value"))
    // wide payload: event_id travels too — the variant whose hot
    // partition crosses the 16 MB threshold so the split can fire
    def aggWide(joined: DataFrame): DataFrame = joined
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.Num.dsum(col("value")).as("sum_value"),
        max(col("event_id")).as("max_event_id"))

    // rep 0 warms page cache + JIT; report the min of the rest. The
    // validation is full-result: every rep's complete collected frame
    // (ALL aggregate columns, canonically sorted) must agree within a
    // variant, and the returned canon is compared ACROSS variants —
    // the r14 form compared only sum(n_events) from the warm-up rep,
    // weak for a tool whose numbers are quoted in Skew.scala's docs.
    // The skew probe unwraps AdaptiveSparkPlanExec to its FINAL
    // (post-re-planning) inner plan on every rep; the outer handle's
    // toString can describe the initial plan.
    def time(label: String)(job: => DataFrame): Seq[String] = {
      var skewFired = false
      val runs = (0 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = job
        val canon = df.collect()
          .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
        val planStr = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan.toString
          case p => p.toString
        }
        skewFired |= planStr.contains("skew=true")
        ((System.nanoTime() - t0) / 1e9, canon)
      }
      require(runs.map(_._2).distinct.size == 1,
        s"$label: reps disagree on the full collected result")
      println(f"[skew-ab] $label%-24s min=${runs.drop(1).map(_._1).min}%7.2fs " +
        f"groups=${runs.head._2.size}%,d (full-result-checked) aqe_split=$skewFired")
      runs.head._2
    }

    val a = time("narrow plain") { aggNarrow(ev.join(dim, "join_key")) }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val b = time("narrow plain (no AQE)") { aggNarrow(ev.join(dim, "join_key")) }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val c = time("narrow salted x16") {
      aggNarrow(graft.operators.Skew.saltedJoin(ev, dim, "join_key",
        factor = 16, saltSource = "event_id"))
    }
    require(a == b && b == c,
      "narrow variants disagree on the full collected result")
    if (forceAqe) {
      val d = time("wide plain (split?)") { aggWide(ev.join(dim, "join_key")) }
      val e = time("wide salted x16") {
        aggWide(graft.operators.Skew.saltedJoin(ev, dim, "join_key",
          factor = 16, saltSource = "event_id"))
      }
      require(d == e, "wide variants disagree on the full collected result")
    }
    spark.stop()
  }
}
