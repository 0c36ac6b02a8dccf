package graft.io

import org.apache.spark.sql.functions._

/** Pins the documented single-writer contract of the swap family
  * (Merge.swapInto / lwwUpsertParquetBucketed scaladoc): a writer that
  * loses the rename race — another writer moved the table (or a bucket)
  * while this apply was in flight — must fail LOUDLY at the rename
  * `require`, never return success having committed against a stale
  * view. Lives in package graft.io for access to the private[io]
  * swapInto, the exact step where the race lands. */
class MergeContentionSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def fs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("swapInto loses the rename race loudly and commits nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race_").toString + "/t"
    Seq((1L, "a")).toDF("k", "name").write.parquet(dir)
    // writer B wins the race: the table moves away mid-A's-apply
    val stolen = dir + "_stolen_by_b"
    assert(fs(dir).rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(stolen)))
    val replacement = Seq((2L, "b")).toDF("k", "name")
    // A's swap must die (the rename-aside require, or the filesystem
    // itself refusing the vanished source) — not bootstrap or silently
    // publish `replacement` as the whole table
    val thrown = intercept[Exception] {
      Merge.swapInto(spark, dir, replacement, suffix = "_merging")
    }
    assert(thrown.isInstanceOf[IllegalArgumentException] ||
      thrown.isInstanceOf[java.io.IOException], s"unexpected failure mode: $thrown")
    assert(!fs(dir).exists(new org.apache.hadoop.fs.Path(dir)),
      "the losing writer must not have committed anything")
    // B's table is intact
    assert(spark.read.parquet(stolen).select("k").as[Long].collect().toSeq === Seq(1L))
  }

  test("bucketed apply dies loudly when a bucket vanishes mid-swap window") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race_b_").toString + "/t"
    val base = (1L to 50L).map(k => (k, s"n$k", 1L)).toDF("k", "name", "v")
    Merge.lwwUpsertParquetBucketed(spark, dir, base, "k", Seq("v"), numBuckets = 4)
    // a second writer holding a conflicting backup of a bucket that is
    // STILL live: recovery treats it as stale and deletes it — then the
    // apply proceeds against the live bucket (no data loss either way)
    val buckets = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_bucket=")).map(_.getName).sorted
    val b0 = buckets.head
    fs(dir).mkdirs(new org.apache.hadoop.fs.Path(dir + "_bak"))
    // plant a stale backup (copy of live bucket) — crash-after-rename-in residue
    org.apache.hadoop.fs.FileUtil.copy(fs(dir), new org.apache.hadoop.fs.Path(s"$dir/$b0"),
      fs(dir), new org.apache.hadoop.fs.Path(s"${dir}_bak/$b0"), false,
      spark.sparkContext.hadoopConfiguration)
    val before = spark.read.parquet(dir).count()
    Merge.lwwUpsertParquetBucketed(spark, dir,
      Seq((999L, "z", 1L)).toDF("k", "name", "v"), "k", Seq("v"), numBuckets = 4)
    assert(spark.read.parquet(dir).count() === before + 1)
    assert(!fs(dir).exists(new org.apache.hadoop.fs.Path(s"${dir}_bak/$b0")),
      "stale backup must be cleared, not restored over the live bucket")
  }

  test("bucketed apply refuses a present table whose _buckets.json side file is missing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race_sf_").toString + "/t"
    val base = (1L to 50L).map(k => (k, s"n$k", 1L)).toDF("k", "name", "v")
    Merge.lwwUpsertParquetBucketed(spark, dir, base, "k", Seq("v"), numBuckets = 4)
    // the side file is lost (external deletion / pre-side-file table):
    // an apply must fail loudly rather than trust the caller's
    // numBuckets — a mismatched count would scatter keys across two
    // incompatible layouts where half the later probes silently miss
    val side = new org.apache.hadoop.fs.Path(dir + "_buckets.json")
    assert(fs(dir).delete(side, false))
    val thrown = intercept[IllegalStateException] {
      Merge.lwwUpsertParquetBucketed(spark, dir,
        Seq((999L, "z", 1L)).toDF("k", "name", "v"), "k", Seq("v"), numBuckets = 4)
    }
    assert(thrown.getMessage.contains("_buckets.json"))
    // nothing was committed: the table still reads its bootstrap rows
    assert(spark.read.parquet(dir).count() === 50L)
  }

  test("bootstrap crash window (side file present, table absent) heals on replay") {
    // the side file is now written BEFORE the rename into place, so the
    // only bootstrap crash window leaves (side file present, table
    // absent) — the replayed epoch must bootstrap cleanly and overwrite
    // the orphaned side file with ITS bucket count. (The old order's
    // window — table present, side file absent — committed a table
    // whose layout guard was permanently disabled.)
    val dir = java.nio.file.Files.createTempDirectory("graft_race_cw_").toString + "/t"
    val side = new org.apache.hadoop.fs.Path(dir + "_buckets.json")
    fs(dir).mkdirs(side.getParent)
    val out = fs(dir).create(side, true)
    out.write("""{"num_buckets":8}""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    Merge.lwwUpsertParquetBucketed(spark, dir,
      (1L to 20L).map(k => (k, s"n$k", 1L)).toDF("k", "name", "v"),
      "k", Seq("v"), numBuckets = 4)
    assert(spark.read.parquet(dir).count() === 20L)
    // the replayed bootstrap owns the side file: the guard now enforces
    // THIS table's layout, not the crashed attempt's
    intercept[IllegalArgumentException] {
      Merge.lwwUpsertParquetBucketed(spark, dir,
        Seq((999L, "z", 1L)).toDF("k", "name", "v"), "k", Seq("v"), numBuckets = 8)
    }
    Merge.lwwUpsertParquetBucketed(spark, dir,
      Seq((999L, "z", 1L)).toDF("k", "name", "v"), "k", Seq("v"), numBuckets = 4)
    assert(spark.read.parquet(dir).count() === 21L)
  }
}
