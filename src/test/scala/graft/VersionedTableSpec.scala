package graft

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import graft.io.VersionedTable

/** The gap-free table swap: version publish is an atomic marker create,
  * so a concurrent reader must ALWAYS resolve a complete committed
  * snapshot — the property Merge.swapInto's rename window lacks. */
class VersionedTableSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_vt_${tag}_").toString + "/t"

  test("write/read round trip, version numbers increase") {
    val root = tmpRoot("rt")
    assert(VersionedTable.currentVersion(spark, root).isEmpty)
    val v1 = VersionedTable.write(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "name"))
    val v2 = VersionedTable.write(spark, root, Seq((1L, "a2")).toDF("k", "name"))
    assert(v1 === 1L && v2 === 2L)
    assert(VersionedTable.currentVersion(spark, root) === Some(2L))
    assert(VersionedTable.read(spark, root).as[(Long, String)].collect().toSet === Set((1L, "a2")))
  }

  test("upsert publishes a new version with merge semantics") {
    val root = tmpRoot("up")
    VersionedTable.write(spark, root, Seq((1L, "a"), (2L, "b")).toDF("k", "name"))
    val (before, after, updated, inserted) = VersionedTable.upsert(
      spark, root, Seq((2L, "b2"), (9L, "z")).toDF("k", "name"), "k")
    assert((before, after, updated, inserted) === ((2L, 3L, 1L, 1L)))
    assert(VersionedTable.read(spark, root).as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b2"), (9L, "z")))
    assert(VersionedTable.currentVersion(spark, root) === Some(2L))
  }

  test("concurrent reader always sees a complete committed snapshot during swaps") {
    val root = tmpRoot("cc")
    def table(n: Int) = spark.range(n * 10L).toDF("k")
    VersionedTable.write(spark, root, table(1))
    val committed = (1 to 6).map(_ * 10L).toSet
    val failure = new AtomicReference[Throwable](null)
    val reads = new AtomicLong(0)
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && failure.get() == null) {
        try {
          val c = VersionedTable.read(spark, root).count()
          if (!committed.contains(c))
            failure.set(new AssertionError(s"read a non-committed snapshot: $c rows"))
          reads.incrementAndGet()
        } catch { case t: Throwable => failure.set(t) }
      }
    })
    reader.start()
    try (2 to 6).foreach(n => VersionedTable.write(spark, root, table(n)))
    finally { stop = true; reader.join(30000) }
    assert(failure.get() == null, s"reader failed mid-swap: ${failure.get()}")
    assert(reads.get() > 0, "reader must have actually read during the writes")
    assert(VersionedTable.read(spark, root).count() === 60L)
  }

  test("vacuum drops old versions, current stays readable") {
    val root = tmpRoot("vac")
    (1 to 4).foreach(n => VersionedTable.write(spark, root, spark.range(n.toLong).toDF("k")))
    val dropped = VersionedTable.vacuum(spark, root, keep = 2)
    assert(dropped === Seq(1L, 2L))
    assert(VersionedTable.read(spark, root).count() === 4L)
    assert(VersionedTable.currentVersion(spark, root) === Some(4L))
    // vacuumed snapshot dirs are gone from disk
    val dirs = new java.io.File(root).listFiles().count(_.getName.startsWith("d-"))
    assert(dirs === 2)
  }

  test("vacuum removes aged orphan snapshots but spares young uncommitted ones") {
    val root = tmpRoot("orph")
    (1 to 2).foreach(n => VersionedTable.write(spark, root, spark.range(n.toLong).toDF("k")))
    // simulate a writer that crashed between the snapshot write and the
    // marker commit: a d-* dir no marker references
    val orphan = new java.io.File(root, "d-deadbeef0000")
    spark.range(5L).toDF("k").write.parquet(orphan.toString)
    def dirNames = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("d-")).map(_.getName).toSet

    // young orphan (age < threshold): spared — could be an in-flight commit
    VersionedTable.vacuum(spark, root, keep = 2, orphanAgeMs = 3600000L)
    assert(dirNames.contains("d-deadbeef0000"))

    // aged orphan (threshold 0): swept; committed snapshots untouched
    VersionedTable.vacuum(spark, root, keep = 2, orphanAgeMs = 0L)
    assert(!dirNames.contains("d-deadbeef0000"), dirNames.toString)
    assert(dirNames.size === 2)
    assert(VersionedTable.read(spark, root).count() === 2L)
  }

  test("vacuum: a dead empty marker atop the log never evicts the newest committed version") {
    val root = tmpRoot("dead")
    (1 to 2).foreach(n => VersionedTable.write(spark, root, spark.range(n.toLong).toDF("k")))
    // dead writer: the NEWEST marker is permanently empty. Counting it
    // toward `keep` would push the newest committed version (v2) into
    // the doomed list and vacuum(keep=1) would delete the current
    // snapshot — the table would become unreadable (data loss).
    val log = new java.io.File(root, "_log")
    val deadMarker = new java.io.File(log, "000000003")
    assert(deadMarker.createNewFile())
    // Age the marker explicitly: the sweep uses strict `mtime < cutoff`
    // (deliberately conservative — a 0 ms-old empty marker could be a
    // commit in flight, so at orphanAgeMs = 0 and same-millisecond mtime
    // it is spared for one extra vacuum). Without this the test races the
    // clock: created and vacuumed within one millisecond, the marker is
    // not yet "aged" and the r17 flake reproduces.
    assert(deadMarker.setLastModified(System.currentTimeMillis() - 60000L))
    val dropped = VersionedTable.vacuum(spark, root, keep = 1, orphanAgeMs = 0L)
    assert(VersionedTable.read(spark, root).count() === 2L,
      "the newest committed version must survive")
    assert(dropped.contains(1L), "the older committed version is vacuumed")
    assert(dropped.contains(3L), "an AGED dead marker is swept")
    assert(!dropped.contains(2L), dropped.toString)
    // a YOUNG empty marker (possible commit in flight) is spared entirely
    assert(new java.io.File(log, "000000004").createNewFile())
    assert(VersionedTable.vacuum(spark, root, keep = 1) === Seq.empty)
    assert(VersionedTable.read(spark, root).count() === 2L)
    // and writers keep committing above the junk
    VersionedTable.write(spark, root, spark.range(9L).toDF("k"))
    assert(VersionedTable.read(spark, root).count() === 9L)
  }

  test("read skips a mid-commit (still empty) marker instead of reading the root") {
    val root = tmpRoot("midc")
    VersionedTable.write(spark, root, spark.range(3L).toDF("k"))
    // simulate the reader's view between the writer's marker create and
    // its content write: a newer marker file that is still EMPTY (this is
    // the microsecond window a concurrent reader can list)
    val empty = new java.io.File(new java.io.File(root, "_log"), "000000002")
    assert(empty.createNewFile(), s"fixture marker exists already: $empty")
    // the empty marker is "not committed yet": reads resolve v1, not the
    // root dir (which is what Path(root, "") used to produce)
    assert(VersionedTable.read(spark, root).count() === 3L)
    // a later real commit takes the NEXT number and becomes current
    VersionedTable.write(spark, root, spark.range(7L).toDF("k"))
    assert(VersionedTable.read(spark, root).count() === 7L)
    // vacuum with the dead empty marker in the doomed range must not
    // throw (no dir name to delete) and must leave the table readable
    VersionedTable.vacuum(spark, root, keep = 1)
    assert(VersionedTable.read(spark, root).count() === 7L)
  }

  test("vacuum: two markers naming the same dir never cost the kept version its data") {
    // tryCommit can retry at n+1 with the SAME materialized dir after an
    // IOException on marker write left marker n in place — the doomed
    // older marker must not delete the dir the kept marker points at
    val root = tmpRoot("shared")
    VersionedTable.write(spark, root, spark.range(3L).toDF("k"))
    VersionedTable.write(spark, root, spark.range(5L).toDF("k"))
    val logDir = new java.io.File(root, "_log")
    val m2 = new java.io.File(logDir, "000000002")
    val dir2 = new String(java.nio.file.Files.readAllBytes(m2.toPath), "UTF-8")
    java.nio.file.Files.write(new java.io.File(logDir, "000000003").toPath,
      dir2.getBytes("UTF-8"))
    assert(VersionedTable.read(spark, root).count() === 5L)
    VersionedTable.vacuum(spark, root, keep = 1)
    assert(VersionedTable.read(spark, root).count() === 5L,
      "the kept version's shared dir must survive the doomed duplicate marker")
  }
}
