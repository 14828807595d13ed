package graft.tables

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.StructType

import graft.SparkTestBase

/** File-level GC (Iceberg `remove_orphan_files` analog): dead files inside
  * a still-referenced commit dir — the debt expire's directory-granular
  * sweep cannot reach — are reclaimed by diffing the file tree against the
  * union of every retained snapshot's refs. */
class OrphanFilesSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = StructType.fromDDL("k STRING, wv BIGINT, v STRING")

  // keys chosen so "a" and "b" land in DIFFERENT buckets at numBuckets=2
  // (xxhash64-based bucketing; asserted in the test so a hash change in
  // either direction fails loudly rather than silently degrading coverage)
  private def newTable(): LakeTable =
    LakeTable.createOrOpen(spark, Files.createTempDirectory("orphan").toString,
      schema, keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)

  private def parquetFiles(t: LakeTable): Set[String] = {
    val d = Paths.get(t.root, "data")
    if (!Files.isDirectory(d)) return Set.empty
    val w = Files.walk(d)
    try w.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => Paths.get(t.root).relativize(p).toString).toSet
    finally w.close()
  }

  test("dead hot-bucket layers inside a cold-anchored dir are reclaimed") {
    val t = newTable()
    // wave 1 writes BOTH buckets into commit-1
    t.merge(Seq(("a", 1L, "a1"), ("b", 1L, "b1")).toDF("k", "wv", "v"), "w1")
    val t1Snap = t.snapshot()
    assert(t1Snap.bucketFiles.keySet.size === 2, "a and b must hash apart")
    // waves 2..4 rewrite ONLY a's bucket; b's file stays anchored in commit-1
    (2L to 4L).foreach(i =>
      t.merge(Seq(("a", i, s"a$i")).toDF("k", "wv", "v"), s"w$i"))
    t.expire(keepVersions = 1)
    // commit-1 survives (b's live file) and still holds a's DEAD layer
    val before = parquetFiles(t)
    val live = t.snapshot().bucketFiles.values.flatten.toSet
    assert((before -- live).nonEmpty, "expected dead files expire can't reach")
    // a generous grace keeps everything
    assert(t.removeOrphanFiles(graceMs = Long.MaxValue) === ((0, 0)))
    // grace 0 reclaims exactly the dead files (+ their emptied bucket dirs)
    val (files, _) = t.removeOrphanFiles(graceMs = 0L)
    assert(files === (before -- live).size)
    assert(parquetFiles(t) === live)
    // the table still serves the LWW winners
    assert(t.read().collect().map(_.getString(2)).toSet === Set("a4", "b1"))
  }

  test("files referenced ONLY by a tagged old version survive the sweep") {
    val t = newTable()
    t.merge(Seq(("a", 1L, "a1"), ("b", 1L, "b1")).toDF("k", "wv", "v"), "w1")
    t.createTag("pin")
    (2L to 4L).foreach(i =>
      t.merge(Seq(("a", i, s"a$i"), ("b", i, s"b$i")).toDF("k", "wv", "v"), s"w$i"))
    t.expire(keepVersions = 1)
    t.removeOrphanFiles(graceMs = 0L)
    // the pinned version still reads in full
    assert(t.readAt("pin").collect().map(_.getString(2)).toSet === Set("a1", "b1"))
    // dropping the pin hands its files to the next sweep
    t.dropTag("pin")
    t.expire(keepVersions = 1)
    val (files, _) = t.removeOrphanFiles(graceMs = 0L)
    assert(parquetFiles(t) === t.snapshot().bucketFiles.values.flatten.toSet)
    assert(files >= 0) // dir-sweep may already have taken whole dirs
  }

  test("planted junk is ignored unless it is an unreferenced parquet file") {
    val t = newTable()
    t.merge(Seq(("a", 1L, "a1")).toDF("k", "wv", "v"), "w1")
    val commitDir = Files.list(Paths.get(t.root, "data")).iterator().asScala
      .toSeq.head
    Files.write(commitDir.resolve("notes.txt"), "keep".getBytes)
    Files.write(commitDir.resolve("stray.parquet"), Array[Byte](1, 2, 3))
    val (files, _) = t.removeOrphanFiles(graceMs = 0L)
    assert(files === 1) // only the stray parquet
    assert(Files.exists(commitDir.resolve("notes.txt")))
    assert(t.read().count() === 1L)
  }

  test("dir sweep honors a live inflight marker; races resolve benignly") {
    val t = newTable()
    t.merge(Seq(("a", 1L, "a1")).toDF("k", "wv", "v"), "w1")
    // an in-flight writer's staging tree: a commit dir whose subdirs are
    // momentarily EMPTY (task-attempt dirs between the committer's
    // renames), guarded only by its fresh inflight marker
    val staged = Paths.get(t.root, "data", "commit-99")
    Files.createDirectories(staged.resolve("_temporary/0"))
    Files.write(Paths.get(t.root, "meta", "inflight-commit-99"), Array[Byte]())
    val (files, _) = t.removeOrphanFiles(graceMs = 0L)
    assert(files === 0)
    assert(Files.isDirectory(staged.resolve("_temporary/0")),
      "dir sweep deleted a marked in-flight writer's empty staging dirs")
    // marker gone (writer committed or crashed past TTL): next pass sweeps
    Files.delete(Paths.get(t.root, "meta", "inflight-commit-99"))
    val (_, dirs) = t.removeOrphanFiles(graceMs = 0L)
    assert(dirs >= 3) // commit-99, _temporary, 0
    assert(!Files.exists(staged))
    assert(t.read().count() === 1L)
  }

  test("GC loop races a live ingest loop: state exact, audit clean") {
    // the whole concurrency protocol at once: writer A merges in a loop
    // while a SECOND handle alternates expire + remove_orphan_files with
    // grace 0 (so ONLY the inflight markers and the abort-on-unreadable/
    // vanished-ledger guards protect the write windows). Any protocol gap
    // surfaces as a writer crash, a GC crash, or lost rows.
    val t1 = newTable()
    val t2 = LakeTable.createOrOpen(spark, t1.root, schema,
      keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)
    val waves = 12
    val gcErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val gc = new Thread(() => {
      try while (!stop.get()) {
        t2.expire(keepVersions = 2)
        t2.removeOrphanFiles(graceMs = 0L)
      } catch { case e: Throwable => gcErr.set(e) }
    }, "gc-racer")
    gc.start()
    try (1L to waves).foreach { i =>
      t1.merge(Seq(("a", i, s"a$i"), ("b", i, s"b$i")).toDF("k", "wv", "v"),
        s"w$i")
    } finally { stop.set(true); gc.join(30000) }
    assert(gcErr.get() === null, s"GC thread crashed: ${gcErr.get()}")
    // final state is the exact LWW winners
    assert(t1.read().collect().map(_.getString(2)).toSet
      === Set(s"a$waves", s"b$waves"))
    // quiesced sweep reclaims the rest; the full audit stays clean
    t1.expire(keepVersions = 1)
    t1.removeOrphanFiles(graceMs = 0L)
    assert(parquetFiles(t1) === t1.snapshot().bucketFiles.values.flatten.toSet)
    val bad = t1.verifyTable(checkData = true).filterNot(_._2)
    assert(bad.isEmpty, s"audit failures after the race: $bad")
  }

  test("SQL: CALL remove_orphan_files") {
    val wh = Files.createTempDirectory("orphan-sql").toString
    spark.conf.set("spark.sql.catalog.orph_sql",
      classOf[graft.tables.dsv2.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.orph_sql.warehouse", wh)
    val t = LakeTable.createOrOpen(spark, s"$wh/t", schema,
      keyCols = Seq("k"), orderCols = Seq("wv"), numBuckets = 2)
    t.merge(Seq(("a", 1L, "a1"), ("b", 1L, "b1")).toDF("k", "wv", "v"), "w1")
    (2L to 3L).foreach(i =>
      t.merge(Seq(("a", i, s"a$i")).toDF("k", "wv", "v"), s"w$i"))
    t.expire(keepVersions = 1)
    val res = spark.sql(
      "CALL orph_sql.system.remove_orphan_files('t', grace_ms => 0)").head()
    assert(res.getInt(0) > 0)
    assert(spark.sql("SELECT v FROM orph_sql.t").as[String].collect().toSet
      === Set("a3", "b1"))
  }
}
