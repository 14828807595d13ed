package graft.app

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.sources.SnapshotFixture

/** CLI smoke: every sink mode end-to-end over a fixture snapshot
  * (main.rs:25-122 surface; one sink per run). Main.getOrCreate reuses the
  * test session, so these run in-process. */
class MainSpec extends SparkTestBase {

  private lazy val snapshotDir: String = {
    val fx = SnapshotFixture.generate(SnapshotFixture.Spec(seed = 21L))
    val dir = Files.createTempDirectory("cli-snap").toString
    SnapshotFixture.writeUnpacked(fx, dir)
    dir
  }

  private def out(name: String): String =
    Files.createTempDirectory(s"cli-$name").toString

  test("--table-out loads the keyed-upsert table (K1)") {
    val dir = out("table")
    Main.main(Array(snapshotDir, "--table-out", dir, "--buckets", "4"))
    val t = graft.tables.LakeTable.open(spark, dir)
    assert(t.read().count() > 0)
    assert(t.snapshot().txns.contains("snapshot-replay"))
  }

  test("--csv-out writes the 4-column base58 projection (K2, csv.rs:14-20)") {
    val dir = out("csv")
    Main.main(Array(snapshotDir, "--csv-out", dir))
    val csv = spark.read.option("header", "true").csv(dir)
    assert(csv.columns.toSeq === Seq("pubkey", "owner", "data_len", "lamports"))
    assert(csv.count() > 0)
  }

  test("--programs-tar then --opcode-stats-out composes like the reference pair") {
    val tarDir = out("ptar")
    val tar = s"$tarDir/programs.tar"
    Main.main(Array(snapshotDir, "--programs-tar", tar))
    assert(Files.size(Paths.get(tar)) > 0)
    val statsDir = out("stats")
    Main.main(Array(tar, "--opcode-stats-out", statsDir))
    val csv = spark.read.option("header", "true").csv(statsDir)
    assert(csv.columns.toSeq === Seq("opcode", "mnemonic", "num_programs", "num_insns"))
    assert(csv.count() > 0)
  }

  test("--replay-table applies full + incrementals in slot order") {
    val work = Files.createTempDirectory("cli-replay").toString
    val (fixtures, expected) = SnapshotFixture.generateStream(seed = 9L, increments = 1)
    fixtures.foreach(fx =>
      SnapshotFixture.writeArchive(fx, s"$work/snap-${fx.manifest.slot}.tar.zst"))
    val dir = out("replaytbl")
    Main.main(Array(work, "--replay-table", dir, "--buckets", "4"))
    val t = graft.tables.LakeTable.open(spark, dir)
    assert(t.read().count() === expected.size.toLong)
  }
}
