package graft

import org.apache.spark.sql.functions._

import graft.io.Maintenance
import graft.operators.Dedup

class MaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  test("compaction collapses many small files and preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_").toString + "/t"
    // 64 tiny files
    spark.range(10000).select(col("id"), (col("id") % 7).as("k"))
      .repartition(64).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir).count()
    val (before, after) = Maintenance.compactParquet(spark, dir, targetFileBytes = 1L << 20)
    assert(before === 64)
    assert(after < 8, s"expected few files, got $after")
    val compacted = spark.read.parquet(dir)
    assert(compacted.count() === beforeRows)
    assert(compacted.agg(sum("id")).head().getLong(0) === (9999L * 10000L) / 2)
  }

  test("compaction of a partitioned table preserves layout and pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_p_").toString + "/t"
    spark.range(4000).select(col("id"), (col("id") % 3).cast("string").as("day"))
      .repartition(16).write.partitionBy("day").parquet(dir)
    val (before, after) = Maintenance.compactParquet(spark, dir, targetFileBytes = 1L << 20)
    assert(before === 48 && after === 3, s"got ($before, $after)") // 16 files × 3 partitions → 1 each
    val back = spark.read.parquet(dir)
    assert(back.count() === 4000)
    val pruned = back.filter(col("day") === "1")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day"),
      s"partition layout must survive compaction:\n$plan")
  }

  test("compactParquet refuses a bucketed LWW target (self-compacting; in-root swap unsafe there)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_b_").toString + "/t"
    graft.io.Merge.lwwUpsertParquetBucketed(spark, dir,
      (1L to 50L).map(kk => (kk, s"n$kk", 1L)).toDF("k", "name", "v"),
      "k", Seq("v"), numBuckets = 4)
    // each apply already rewrites its dirty buckets whole (one file per
    // bucket), so there is nothing to compact — and the generic pass's
    // in-root `_old` staging would strand a `_bucket=N_old` dir on crash
    // that partition discovery misparses; it must refuse loudly
    val thrown = intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, dir)
    }
    assert(thrown.getMessage.contains("self-compacting"))
    // the table is untouched and still reads
    assert(spark.read.parquet(dir).count() === 50L)
  }

  test("compactNearDupIndex folds batches into __base__ with probe results identical") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val corpus = Seq(
      (0L, base, "s1"),
      (1L, base, "s1"), // exact dup — deterministic banding, see below
      (2L, "one two three four five six seven eight nine ten", "s2"))
      .toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_nd_compact_").toString
    Dedup.buildNearDupIndex(corpus, dir)
    // exact copies: identical shingle sets match every band, so LSH
    // detection is deterministic (edited variants sit near the banding's
    // p≈0.5 regime and could legitimately miss)
    val day1 = Seq((10L, base, "d1")).toDF("doc_id", "text", "source")
    Dedup.registerInNearDupIndex(day1, dir, "day1")
    // the hard case: doc 10 registered under TWO labels (fresh-checkpoint
    // re-run) — compaction must fold the duplicate rows, not concatenate
    Dedup.registerInNearDupIndex(day1, dir, "day1-again")
    val day2 = Seq((20L, base, "d2")).toDF("doc_id", "text", "source")
    def probe() = Dedup.nearDupsAgainstIndex(day2, dir, threshold = 0.5)
    val before = probe().as[(Long, Long, Double)].collect().toSet
    assert(before.map(_._1) === Set(0L, 1L, 10L), s"fixture sanity: $before")

    assert(Dedup.compactNearDupIndex(spark, dir) === 2, "two labels folded")
    val afterDf = probe()
    assert(afterDf.as[(Long, Long, Double)].collect().toSet === before,
      "probe results (including jaccard against the double-registered doc) " +
        "must be identical after compaction")
    // the fold restores the single-label layout: cheap plain-count verify,
    // only __base__ on disk
    assert(!afterDf.queryExecution.optimizedPlan.toString.toLowerCase
        .contains("count(distinct"),
      "compacted index must plan the plain-count verify")
    for (t <- Seq("bands", "shingles")) {
      val parts = new java.io.File(s"$dir/$t").listFiles()
        .filter(_.getName.startsWith("_batch=")).map(_.getName).toSet
      assert(parts === Set("_batch=__base__"), s"$t: $parts")
    }
    // idempotent: a second run is a no-op
    assert(Dedup.compactNearDupIndex(spark, dir) === 0)
    assert(probe().as[(Long, Long, Double)].collect().toSet === before)
    // and registration keeps working on the compacted index
    Dedup.registerInNearDupIndex(day2, dir, "day3")
    val day4 = Seq((30L, base, "d4")).toDF("doc_id", "text", "source")
    val laterHits = Dedup.nearDupsAgainstIndex(day4, dir, threshold = 0.9)
      .select("doc_a").as[Long].collect().toSet
    assert(laterHits.contains(20L), s"post-compaction registration findable: $laterHits")
  }

  test("compactNearDupIndex heals a crash inside the __base__ overwrite") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val corpus = Seq(
      (0L, base, "s1"),
      (2L, "one two three four five six seven eight nine ten", "s2"))
      .toDF("doc_id", "text", "source")
    def mkIndex() = {
      val dir = java.nio.file.Files.createTempDirectory("graft_nd_heal_").toString
      Dedup.buildNearDupIndex(corpus, dir)
      Dedup.registerInNearDupIndex(
        Seq((10L, base, "d1")).toDF("doc_id", "text", "source"), dir, "day1")
      dir
    }
    val ref = mkIndex()
    val damaged = mkIndex()
    val day2 = Seq((20L, base, "d2")).toDF("doc_id", "text", "source")
    Dedup.compactNearDupIndex(spark, ref)
    val expected = Dedup.nearDupsAgainstIndex(day2, ref, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.map(_._1) === Set(0L, 10L), s"fixture sanity: $expected")
    // simulate the crash: the fold completed to the tmp generation, then
    // the __base__ dynamic overwrite died after dropping the partition
    // dir — doc 0 now exists ONLY in the surviving tmp
    spark.read.parquet(s"$damaged/shingles").select("doc_id", "sz", "sh").distinct()
      .write.parquet(s"$damaged/_compacting_shingles")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(s"$damaged/shingles/_batch=__base__"))
    // a probe against the half-overwritten table must refuse, not
    // silently under-report (the damaged window has no other signal)
    val refused = intercept[IllegalStateException] {
      Dedup.nearDupsAgainstIndex(day2, damaged, threshold = 0.5).collect()
    }
    assert(refused.getMessage.contains("pending compaction"),
      s"probe must name the pending generation: ${refused.getMessage}")
    Dedup.compactNearDupIndex(spark, damaged)
    val healed = Dedup.nearDupsAgainstIndex(day2, damaged, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(healed === expected,
      "re-run must union the surviving tmp fold back in, not re-derive from the damaged table")
  }

  test("compactNearDupIndex clears a complete tmp even with no batch partitions left") {
    // the OTHER crash window: fold done, __base__ overwritten, batch
    // partitions deleted — only the tmp cleanup never ran. The batch
    // inventory is empty, so a labels-only short-circuit would skip the
    // fold, strand the tmp, and leave probes refusing forever (no re-run
    // could converge the state).
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val corpus = Seq((0L, base, "s1")).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_nd_tmp_").toString
    Dedup.buildNearDupIndex(corpus, dir)
    val day2 = Seq((20L, base, "d2")).toDF("doc_id", "text", "source")
    val expected = Dedup.nearDupsAgainstIndex(day2, dir, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.map(_._1) === Set(0L), s"fixture sanity: $expected")
    // recreate the post-delete state: a complete tmp whose rows are
    // already folded into __base__ (stale-but-complete)
    spark.read.parquet(s"$dir/shingles").select("doc_id", "sz", "sh").distinct()
      .write.parquet(s"$dir/_compacting_shingles")
    intercept[IllegalStateException] {
      Dedup.nearDupsAgainstIndex(day2, dir, threshold = 0.5).collect()
    }
    Dedup.compactNearDupIndex(spark, dir)
    assert(Dedup.pendingCompactionGenerations(spark, dir).isEmpty,
      "the heal run must clear the stranded tmp generation")
    val healed = Dedup.nearDupsAgainstIndex(day2, dir, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(healed === expected, "probe results unchanged after the heal")
  }

  test("compactHashIndex folds epoch appends; dedup decisions identical") {
    import graft.streaming.StreamingManifest
    def doc(i: Int) =
      s"hash index compaction fixture document $i with enough body text " +
        s"to score and split deterministically $i"
    val idx = java.nio.file.Files.createTempDirectory("graft_hc_").toString + "/hashes"
    val out1 = java.nio.file.Files.createTempDirectory("graft_hm1_").toString + "/m"
    StreamingManifest.appendEpoch(
      Seq((1L, doc(1), "en"), (2L, doc(2), "en")).toDF("doc_id", "text", "lang"),
      idx, out1, epochId = 0L, run = "run-A")
    StreamingManifest.appendEpoch(
      Seq((3L, doc(3), "en"), (4L, doc(1), "en")).toDF("doc_id", "text", "lang"),
      idx, out1, epochId = 1L, run = "run-A")
    val (fBefore, fAfter) = StreamingManifest.compactHashIndex(spark, idx)
    assert(fBefore > fAfter && fAfter >= 1, s"($fBefore, $fAfter)")
    // a post-compaction epoch still sees every previously registered hash:
    // docs 10/11 dup epochs 0/1's content, 12 is fresh
    val e2 = Seq((10L, doc(1), "en"), (11L, doc(3), "en"), (12L, doc(12), "en"))
      .toDF("doc_id", "text", "lang")
    StreamingManifest.appendEpoch(e2, idx, out1, epochId = 2L, run = "run-A")
    val kept = spark.read.parquet(out1)
      .filter(col("_epoch") === 2L && col("dedup_keep"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(12L), s"compacted hashes must still block dups: $kept")
    // compacting again (single fold present + epoch-2 files) stays correct
    StreamingManifest.compactHashIndex(spark, idx)
    val hashes = spark.read.parquet(idx).select("text_hash").distinct().count()
    assert(hashes === 4L, "1,2,3,12 — one digest per unique document")
    // the replay-exclusion key survives compaction: a stream stopped
    // mid-epoch replays its final epoch after maintenance ran — it must
    // re-decide identically, not see its own prior registration
    StreamingManifest.appendEpoch(
      Seq((3L, doc(3), "en"), (4L, doc(1), "en")).toDF("doc_id", "text", "lang"),
      idx, out1, epochId = 1L, run = "run-A")
    val replayed = spark.read.parquet(out1).filter(col("_epoch") === 1L)
      .select("doc_id", "dedup_keep").as[(Long, Boolean)].collect()
    assert(replayed.filter(_._1 == 3L).forall(_._2) &&
      replayed.filter(_._1 == 4L).forall(!_._2),
      s"replayed epoch decisions must be unchanged: ${replayed.toSeq}")
  }
}
