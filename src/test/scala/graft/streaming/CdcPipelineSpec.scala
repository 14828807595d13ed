package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkTestBase
import graft.sources.SnapshotFixture
import graft.tables.LakeTable

class SnapshotReplaySpec extends SparkTestBase {

  test("full + incrementals replay reaches the LWW oracle state; rerun is a no-op") {
    val (fixtures, expected) = SnapshotFixture.generateStream(seed = 7L, increments = 2)
    val dir = Files.createTempDirectory("replay").toString
    fixtures.foreach(fx => SnapshotFixture.writeArchive(fx, s"$dir/snap-${fx.manifest.slot}.tar.zst"))

    val table = SnapshotReplay.createTable(spark, Files.createTempDirectory("acctbl").toString, 8)
    val upserts = SnapshotReplay.replayDir(spark, table, dir)
    assert(upserts > 0)

    // final state must equal the independent in-memory fold, including the
    // content integrity invariant sha256(data)
    val rows = table.read()
      .select(col("pubkey"), col("writeVersion"), col("slot"), col("lamports"), sha2(col("data"), 256).as("sha"))
      .collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val exp = expected(r.getAs[Array[Byte]]("pubkey").toSeq)
      assert(r.getAs[Long]("writeVersion") === exp.writeVersion)
      assert(r.getAs[Long]("slot") === exp.slot)
      assert(r.getAs[Long]("lamports") === exp.lamports)
      val expSha = java.security.MessageDigest.getInstance("SHA-256").digest(exp.data)
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("sha") === expSha)
    }

    // replaying the same directory again applies nothing (exactly-once)
    val v = table.currentVersion()
    assert(SnapshotReplay.replayDir(spark, table, dir) === 0L)
    assert(table.currentVersion() === v)
    // lineage carries one entry per snapshot batch
    assert(table.snapshot().lineage.keySet.count(_.startsWith("snapshot:")) === fixtures.size)
  }

  test("batched bootstrap replay equals the sequential per-archive fold; " +
      "rerun no-ops; a later incremental still applies") {
    val (fixtures, _) = SnapshotFixture.generateStream(seed = 11L, increments = 2)
    val dir = Files.createTempDirectory("replayb").toString
    // hold the LAST incremental back — it arrives after the bootstrap
    fixtures.dropRight(1).foreach(fx =>
      SnapshotFixture.writeArchive(fx, s"$dir/snap-${fx.manifest.slot}.tar.zst"))

    val batched = SnapshotReplay.createTable(spark, Files.createTempDirectory("acctblB").toString, 8)
    val seqT = SnapshotReplay.createTable(spark, Files.createTempDirectory("acctblS").toString, 8)
    assert(SnapshotReplay.replayDirBatched(spark, batched, dir) > 0L)
    SnapshotReplay.replayDir(spark, seqT, dir)
    def state(t: LakeTable) = t.read()
      .selectExpr("hex(pubkey)", "writeVersion", "slot", "lamports", "sha2(data, 256)")
      .collect().map(_.toSeq).toSet
    assert(state(batched) === state(seqT))
    // re-running the same directory is a no-op (directory-level watermark)
    val v = batched.currentVersion()
    assert(SnapshotReplay.replayDirBatched(spark, batched, dir) === 0L)
    assert(batched.currentVersion() === v)
    // the late incremental lands: its slot advances the directory watermark
    val late = fixtures.last
    SnapshotFixture.writeArchive(late, s"$dir/snap-${late.manifest.slot}.tar.zst")
    assert(SnapshotReplay.replayDirBatched(spark, batched, dir) > 0L)
    SnapshotReplay.replayDir(spark, seqT, dir)
    assert(state(batched) === state(seqT))
  }

  test("archive-tail stream: archives dropped over time (out of order, with " +
      "restart and re-delivery) reach exactly the batch-replay state") {
    val (fixtures, _) = SnapshotFixture.generateStream(seed = 23L, increments = 2)
    val Seq(full, inc1, inc2) = fixtures
    val stage = Files.createTempDirectory("tail-stage").toString
    fixtures.foreach(fx =>
      SnapshotFixture.writeArchive(fx, s"$stage/snap-${fx.manifest.slot}.tar.zst"))

    // the batch oracle: replayDir over all three archives at once
    val oracle = SnapshotReplay.createTable(spark, Files.createTempDirectory("tail-oracle").toString, 8)
    SnapshotReplay.replayDir(spark, oracle, stage)
    def state(t: graft.tables.LakeTable) = t.read()
      .selectExpr("hex(pubkey)", "writeVersion", "slot", "lamports", "sha2(data, 256)")
      .collect().map(_.toSeq).toSet

    val arrival = Files.createTempDirectory("tail-arrival").toString
    val cp = Files.createTempDirectory("tail-cp").toString
    val table = SnapshotReplay.createTable(spark, Files.createTempDirectory("tail-tbl").toString, 8)
    def drop(fx: graft.sources.SnapshotFixture.Fixture): Unit =
      SnapshotFixture.writeArchive(fx, s"$arrival/snap-${fx.manifest.slot}.tar.zst")

    // wave 1: the full snapshot arrives, stream catches up, "crashes" (stops)
    drop(full)
    SnapshotReplay.runArchiveTailOnce(spark, table, arrival, cp)
    assert(table.read().count() > 0)
    // wave 2 AFTER restart from the same checkpoint, OUT OF ORDER: the later
    // incremental arrives before the earlier one — per-archive watermarks +
    // commutative LWW must still converge (a shared slot watermark would
    // silently skip inc1 here)
    drop(inc2)
    SnapshotReplay.runArchiveTailOnce(spark, table, arrival, cp)
    drop(inc1)
    SnapshotReplay.runArchiveTailOnce(spark, table, arrival, cp)
    assert(state(table) === state(oracle))
    // restart with nothing new: no-op, version unchanged
    val v = table.currentVersion()
    SnapshotReplay.runArchiveTailOnce(spark, table, arrival, cp)
    assert(table.currentVersion() === v)
    // one bounded txn entry per archive
    assert(table.snapshot().txns.keySet === fixtures.map(fx =>
      s"snapshot:snap-${fx.manifest.slot}.tar.zst").toSet)
  }

  test("orphaned _staging dirs from a crashed run are swept by the next apply, " +
      "and a clean apply leaves _staging empty") {
    val (fixtures, _) = SnapshotFixture.generateStream(seed = 13L, increments = 0)
    val dir = Files.createTempDirectory("replay-sweep").toString
    val archive = s"$dir/snap-${fixtures.head.manifest.slot}.tar.zst"
    SnapshotFixture.writeArchive(fixtures.head, archive)
    val table = SnapshotReplay.createTable(spark, Files.createTempDirectory("acctbl-sw").toString, 4)
    // simulate a JVM crash mid-staging: leftover staging parquet in the root
    val orphan = java.nio.file.Paths.get(table.root, "_staging", "crashed-123")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-zombie.parquet"), Array[Byte](1, 2, 3))
    assert(SnapshotReplay.applySnapshot(spark, table, archive) > 0L)
    val staging = new java.io.File(table.root, "_staging")
    assert(!staging.exists() || staging.list().isEmpty,
      s"staging not swept: ${Option(staging.list()).map(_.toSeq)}")
  }
}

class CdcPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private val changeSchema = StructType.fromDDL(
    "repo STRING, path STRING, commitSeq BIGINT, lang STRING, content STRING")

  private def mkTable(): LakeTable =
    LakeTable.createOrOpen(spark, Files.createTempDirectory("repotbl").toString,
      changeSchema, keyCols = Seq("repo", "path"), orderCols = Seq("commitSeq"), numBuckets = 8)

  test("streamed change batches reach the fold state and survive restart") {
    val changeDir = Files.createTempDirectory("changes").toString
    val cp = Files.createTempDirectory("cp").toString
    val table = mkTable()

    val b1 = Seq(
      ("r1", "a.scala", 1L, "scala", "v1 of a"),
      ("r1", "b.scala", 1L, "scala", "v1 of b"),
      ("r2", "x.py", 1L, "python", "v1 of x"))
    b1.toDF("repo", "path", "commitSeq", "lang", "content")
      .write.mode("append").parquet(changeDir)
    CdcPipeline.runOnce(spark, table, changeDir, changeSchema, cp, "pipe1")
    assert(table.read().count() === 3L)

    // second wave of changes lands; the SAME checkpoint resumes and only
    // processes the new files
    val b2 = Seq(
      ("r1", "a.scala", 2L, "scala", "v2 of a"),
      ("r2", "y.py", 2L, "python", "v1 of y"),
      ("r1", "a.scala", 1L, "scala", "stale replay of v1"))
    b2.toDF("repo", "path", "commitSeq", "lang", "content")
      .write.mode("append").parquet(changeDir)
    CdcPipeline.runOnce(spark, table, changeDir, changeSchema, cp, "pipe1")

    val state = table.read()
      .select("repo", "path", "commitSeq", "content")
      .as[(String, String, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(state === Map(
      ("r1", "a.scala") -> ((2L, "v2 of a")),
      ("r1", "b.scala") -> ((1L, "v1 of b")),
      ("r2", "x.py") -> ((1L, "v1 of x")),
      ("r2", "y.py") -> ((2L, "v1 of y"))))

    // content sha256 invariant per final row
    val shas = table.read().select(col("repo"), col("path"), sha2(col("content"), 256).as("sha"))
      .as[(String, String, String)].collect().toSet
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(shas === Set(
      ("r1", "a.scala", sha("v2 of a")), ("r1", "b.scala", sha("v1 of b")),
      ("r2", "x.py", sha("v1 of x")), ("r2", "y.py", sha("v1 of y"))))

    // re-delivery of an already-applied micro-batch is a no-op, both via the
    // txn watermark (the pipeline's mechanism) and the legacy id ledger
    val v = table.currentVersion()
    assert(table.merge(
      Seq(("r9", "z.md", 9L, "md", "ghost")).toDF("repo", "path", "commitSeq", "lang", "content"),
      "pipe1-0-retry", txn = Some(("pipe1", 0L))) === 0L)
    assert(table.merge(
      Seq(("r9", "z.md", 9L, "md", "ghost")).toDF("repo", "path", "commitSeq", "lang", "content"),
      "pipe1-0") === 0L)
    assert(table.currentVersion() === v)
    // the pipeline's txn watermark is bounded per-writer metadata
    assert(table.snapshot().txns.keySet === Set("pipe1"))
  }

  test("a change stream carrying deletes tombstones keys through the " +
      "pipeline; a later re-add revives them") {
    val changeDir = Files.createTempDirectory("changes-del").toString
    val cp = Files.createTempDirectory("cp-del").toString
    val delSchema = StructType.fromDDL(
      "repo STRING, path STRING, commitSeq BIGINT, lang STRING, content STRING, deleted BOOLEAN")
    val table = LakeTable.createOrOpen(spark,
      Files.createTempDirectory("repotbl-del").toString, delSchema,
      keyCols = Seq("repo", "path"), orderCols = Seq("commitSeq"), numBuckets = 8,
      tombstoneCol = Some("deleted"))
    Seq(
      ("r1", "a.scala", 1L, "scala", "v1 of a", false),
      ("r1", "b.scala", 1L, "scala", "v1 of b", false),
      ("r1", "b.scala", 2L, "scala", null: String, true), // file deleted at commit 2
      ("r2", "x.py", 1L, "python", "v1 of x", false))
      .toDF("repo", "path", "commitSeq", "lang", "content", "deleted")
      .write.mode("append").parquet(changeDir)
    CdcPipeline.runOnce(spark, table, changeDir, delSchema, cp, "pipe-del")
    assert(table.read().select("path").as[String].collect().toSet === Set("a.scala", "x.py"))
    // the delete reached the changelog (CDC egress) even though read() hides it
    val changes = table.readChanges(0L, table.currentVersion())
      .select("path", "deleted").as[(String, Boolean)].collect().toMap
    assert(changes("b.scala") === true)
    // re-add after delete: newer commitSeq revives the key
    Seq(("r1", "b.scala", 3L, "scala", "v3 of b", false))
      .toDF("repo", "path", "commitSeq", "lang", "content", "deleted")
      .write.mode("append").parquet(changeDir)
    CdcPipeline.runOnce(spark, table, changeDir, delSchema, cp, "pipe-del")
    val state = table.read().select("path", "content").as[(String, String)].collect().toMap
    assert(state("b.scala") === "v3 of b" && state.size === 3)
  }

  test("a live MOR ingest stream and a concurrent maintenance loop from a " +
      "second handle both survive (OCC) and reach the fold state") {
    val changeDir = Files.createTempDirectory("changes-occ").toString
    val cp = Files.createTempDirectory("cp-occ").toString
    val table = mkTable()
    val maint = LakeTable.open(spark, table.root)
    // 24 micro-batches (one file each), every key rewritten repeatedly
    val nBatches = 24
    (1 to nBatches).foreach { b =>
      (0 until 6).map(i => (s"r${i % 3}", s"f$i.scala", b.toLong, "scala", s"v$b of f$i"))
        .toDF("repo", "path", "commitSeq", "lang", "content")
        .coalesce(1).write.mode("append").parquet(changeDir)
    }
    // operator-issued maintenance racing the stream: compact in a tight
    // loop from a SECOND handle until the stream drains
    @volatile var streaming = true
    @volatile var maintFailure: Option[Throwable] = None
    var compactions = 0
    val maintThread = new Thread(() => {
      try while (streaming) { compactions += maint.compactBuckets(maint.snapshot().morBuckets); Thread.sleep(20) }
      catch { case t: Throwable => maintFailure = Some(t) }
    }, "maintenance-loop")
    maintThread.start()
    val oldShuf = spark.conf.get("spark.sql.shuffle.partitions")
    try
      // default auto-expiry stays ON: the inflight staging markers protect
      // the concurrent maintenance writes from the stream's expire sweeps
      CdcPipeline.runOnce(spark, table, changeDir, changeSchema, cp, "pipe-occ",
        maxFilesPerTrigger = 1, mor = true, compactEveryBatches = None)
    finally { streaming = false; maintThread.join(30000) }
    // the racing scoped shuffle-partition caps must restore to the baseline
    // (depth-tracked restore, not save/restore pairs that can interleave)
    assert(spark.conf.get("spark.sql.shuffle.partitions") === oldShuf,
      "concurrent withSpjConfs windows clobbered the session shuffle partitions")
    assert(maintFailure.isEmpty, s"maintenance loop died: $maintFailure")
    table.compact()
    val state = table.read().select("repo", "path", "commitSeq", "content")
      .as[(String, String, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(state === (0 until 6).map(i =>
      (s"r${i % 3}", s"f$i.scala") -> ((nBatches.toLong, s"v$nBatches of f$i"))).toMap)
    assert(table.snapshot().txns("pipe-occ") === (nBatches - 1).toLong)
    assert(table.logicalRowCount() === 6L)
  }

  test("merge-on-read streaming ingest reaches the same state; periodic " +
      "compaction clears the layer debt mid-stream") {
    val changeDir = Files.createTempDirectory("changes-mor").toString
    val cp = Files.createTempDirectory("cp-mor").toString
    val table = mkTable()
    // two waves through MOR ingest with compaction every 2 batches
    Seq(
      ("r1", "a.scala", 1L, "scala", "v1 of a"),
      ("r1", "b.scala", 1L, "scala", "v1 of b"))
      .toDF("repo", "path", "commitSeq", "lang", "content")
      .write.mode("append").parquet(changeDir)
    CdcPipeline.runOnce(spark, table, changeDir, changeSchema, cp, "pipeM",
      mor = true, compactEveryBatches = Some(2))
    Seq(
      ("r1", "a.scala", 3L, "scala", "v3 of a"),
      ("r1", "a.scala", 2L, "scala", "stale v2"),
      ("r2", "x.py", 1L, "python", "v1 of x"))
      .toDF("repo", "path", "commitSeq", "lang", "content")
      .write.mode("append").parquet(changeDir)
    CdcPipeline.runOnce(spark, table, changeDir, changeSchema, cp, "pipeM",
      mor = true, compactEveryBatches = Some(2))
    // batch 1 (the second micro-batch, id 1) triggered compaction: no debt
    assert(table.snapshot().morBuckets.isEmpty)
    val state = table.read().select("repo", "path", "commitSeq", "content")
      .as[(String, String, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(state === Map(
      ("r1", "a.scala") -> ((3L, "v3 of a")),
      ("r1", "b.scala") -> ((1L, "v1 of b")),
      ("r2", "x.py") -> ((1L, "v1 of x"))))
  }

  test("a bounded MOR run compacts on termination even between periodic " +
      "boundaries (no indefinite layer debt)") {
    val changeDir = Files.createTempDirectory("changes-fc").toString
    val cp = Files.createTempDirectory("cp-fc").toString
    val table = mkTable()
    // one batch, periodic compaction disabled: only the final compact runs
    Seq(("r1", "a.scala", 1L, "scala", "v1"), ("r1", "a.scala", 2L, "scala", "v2"))
      .toDF("repo", "path", "commitSeq", "lang", "content")
      .write.mode("append").parquet(changeDir)
    CdcPipeline.runOnce(spark, table, changeDir, changeSchema, cp, "pipeF",
      mor = true, compactEveryBatches = None)
    Seq(("r1", "a.scala", 3L, "scala", "v3"))
      .toDF("repo", "path", "commitSeq", "lang", "content")
      .write.mode("append").parquet(changeDir)
    CdcPipeline.runOnce(spark, table, changeDir, changeSchema, cp, "pipeF",
      mor = true, compactEveryBatches = None)
    assert(table.snapshot().morBuckets.isEmpty)
    assert(table.read().select("commitSeq").as[Long].collect().toSeq === Seq(3L))
  }

  test("auto-expiry retires old versions as the stream advances") {
    val changeDir = Files.createTempDirectory("changes-e").toString
    val cp = Files.createTempDirectory("cp-e").toString
    val table = mkTable()
    // the SAME key every batch: each merge rewrites the same bucket, so
    // earlier commit dirs lose their last reference and must be GC'd
    // (commit dirs still referenced by retained snapshots must survive)
    (1 to 6).foreach { i =>
      Seq(("r1", "same.txt", i.toLong, "txt", s"v$i"))
        .toDF("repo", "path", "commitSeq", "lang", "content")
        .write.mode("append").parquet(changeDir)
      CdcPipeline.runOnce(spark, table, changeDir, changeSchema, cp, "pipeE",
        autoExpireKeepVersions = Some(2))
    }
    assert(table.read().count() === 1L)
    assert(table.read().select("content").as[String].head() === "v6")
    val metaDir = new java.io.File(table.root, "meta")
    val versions = metaDir.list().count(n => n.startsWith("v") && n.endsWith(".json"))
    assert(versions <= 2, s"expected <= 2 retained versions, found $versions")
    val commits = new java.io.File(table.root, "data").list().count(_.startsWith("commit-"))
    assert(commits <= 2, s"expected old commit dirs GC'd, found $commits")
  }

  test("runOnce surfaces per-batch counters (incl. dead-letter style) into lineage") {
    val changeDir = Files.createTempDirectory("changes-c").toString
    val cp = Files.createTempDirectory("cp-c").toString
    val table = mkTable()
    Seq(
      ("r1", "a.scala", 1L, "scala", "ok"),
      ("r1", "b.bin", 1L, "binary", null: String),   // dead-letter analog
      ("r1", "c.scala", 1L, "scala", "ok2"))
      .toDF("repo", "path", "commitSeq", "lang", "content")
      .write.mode("append").parquet(changeDir)
    CdcPipeline.runOnce(spark, table, changeDir, changeSchema, cp, "pipeC",
      counterCols = Map(
        "dead_letters" -> count(when(col("content").isNull, 1)),
        "scala_rows" -> count(when(col("lang") === "scala", 1))))
    val lineage = table.snapshot().lineage
    val e = lineage(lineage.keys.filter(_.startsWith("pipeC-")).head)
    assert(e.counters("rows_in") === 3L)
    assert(e.counters("upserts") === 3L)
    assert(e.counters("dead_letters") === 1L)
    assert(e.counters("scala_rows") === 2L)
  }
}
