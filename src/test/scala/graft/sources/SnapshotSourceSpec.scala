package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.etl.model.AccountUpdate

class SnapshotSourceSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def key(r: AccountUpdate) =
    (r.pubkey.toSeq, r.slot, r.writeVersion, r.lamports, r.owner.toSeq,
      r.executable, r.rentEpoch, r.data.toSeq)

  private lazy val fx = SnapshotFixture.generate(SnapshotFixture.Spec())

  test("unpacked source yields exactly the generated records") {
    val dir = tmpDir("snap-unpacked")
    SnapshotFixture.writeUnpacked(fx, dir)
    val src = SnapshotSource.open(spark, dir)
    assert(src.isInstanceOf[UnpackedSnapshotSource])
    assert(src.manifest.slot === fx.manifest.slot)
    assert(src.manifest.entries.toSet === fx.manifest.entries.toSet)
    val got = src.accountUpdates(spark).collect().map(key).toSet
    assert(got === fx.allRecords.map(key).toSet)
    assert(got.size === fx.allRecords.size) // no dup loss: all records distinct by writeVersion
  }

  test("archive source yields the same records as unpacked") {
    val dir = tmpDir("snap-arch")
    val file = s"$dir/snapshot-${fx.manifest.slot}.tar.zst"
    SnapshotFixture.writeArchive(fx, file)
    val src = SnapshotSource.open(spark, file)
    assert(src.isInstanceOf[ArchiveSnapshotSource])
    assert(src.manifest.entries.toSet === fx.manifest.entries.toSet)
    val got = src.accountUpdates(spark).collect().map(key).toSet
    assert(got === fx.allRecords.map(key).toSet)
  }

  test("on-disk vec absent from manifest fails (UnexpectedAppendVec, archived.rs:123-125)") {
    val dir = tmpDir("snap-unexpected")
    SnapshotFixture.writeUnpacked(fx, dir, plantUnexpectedVec = true)
    val src = SnapshotSource.open(spark, dir).asInstanceOf[UnpackedSnapshotSource]
    intercept[UnexpectedAppendVecException](src.appendVecRefs())
  }

  test("missing status_cache gate (unpacked.rs:30-33)") {
    val dir = tmpDir("snap-nogate")
    SnapshotFixture.writeUnpacked(fx, dir)
    Files.delete(java.nio.file.Paths.get(dir, "snapshots", "status_cache"))
    intercept[IllegalArgumentException](SnapshotSource.open(spark, dir))
  }

  test("filename filters (F1-F3)") {
    assert(SnapshotSource.parseVecName("123.4") === Some((123L, 4L)))
    assert(SnapshotSource.parseVecName("x.4") === None)
    assert(SnapshotSource.parseVecName("123") === None)
    assert(SnapshotSource.parseArchiveVecPath("accounts/9.1") === Some((9L, 1L)))
    assert(SnapshotSource.parseArchiveVecPath("accounts/sub/9.1") === None)
    assert(SnapshotSource.parseManifestPath("snapshots/7/7") === Some(7L))
    assert(SnapshotSource.parseManifestPath("snapshots/7/8") === None)
  }
}
