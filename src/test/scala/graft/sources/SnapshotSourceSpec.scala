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

/** S5: HTTP streaming source against an in-test localhost server. */
class HttpSnapshotSourceSpec extends SparkTestBase {

  test("streams a fixture archive over HTTP; matches the local decode") {
    val fx = SnapshotFixture.generate(SnapshotFixture.Spec(seed = 11L))
    val dir = java.nio.file.Files.createTempDirectory("http-snap").toString
    val file = s"$dir/snap.tar.zst"
    SnapshotFixture.writeArchive(fx, file)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))

    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/snap.tar.zst", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(200, bytes.length.toLong)
      try ex.getResponseBody.write(bytes) finally ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/snap.tar.zst"
      val src = SnapshotSource.open(spark, url)
      assert(src.isInstanceOf[HttpSnapshotSource]) // dispatch (main.rs:188-200)
      assert(src.manifest.slot === fx.manifest.slot)
      assert(src.manifest.entries.toSet === fx.manifest.entries.toSet)
      val viaHttp = src.accountUpdates(spark).collect()
        .map(r => (r.pubkey.toSeq, r.writeVersion, r.lamports)).sortBy(_.toString)
      val viaFile = ArchiveSnapshotSource(spark, file).accountUpdates(spark).collect()
        .map(r => (r.pubkey.toSeq, r.writeVersion, r.lamports)).sortBy(_.toString)
      assert(viaHttp.length === fx.allRecords.size)
      assert(viaHttp.toSeq === viaFile.toSeq)
    } finally server.stop(0)
  }

  test("replaying a URL costs exactly ONE GET (one-pass staging: rows + " +
      "manifest from the same stream)") {
    val fx = SnapshotFixture.generate(SnapshotFixture.Spec(seed = 13L))
    val dir = java.nio.file.Files.createTempDirectory("http-once").toString
    val file = s"$dir/snap.tar.zst"
    SnapshotFixture.writeArchive(fx, file)
    @volatile var served = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))
    val gets = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/snap.tar.zst", (ex: com.sun.net.httpserver.HttpExchange) => {
      gets.incrementAndGet()
      val bytes = served
      ex.sendResponseHeaders(200, bytes.length.toLong)
      try ex.getResponseBody.write(bytes) finally ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/snap.tar.zst"
      val tableDir = java.nio.file.Files.createTempDirectory("http-once-tbl").toString
      val table = graft.streaming.SnapshotReplay.createTable(spark, s"$tableDir/t", 4)
      val n = graft.streaming.SnapshotReplay.applySnapshot(spark, table, url)
      assert(n > 0)
      assert(gets.get() === 1, "replay must fetch the archive exactly once")
      // the staged merge carried the in-stream manifest slot into the ledger
      assert(table.snapshot().txns("snapshot-replay") === fx.manifest.slot)
      // re-delivery: must re-fetch (the URL could have been refreshed in
      // place with a newer snapshot — only the in-stream slot can decide),
      // then no-op on the slot watermark
      assert(graft.streaming.SnapshotReplay.applySnapshot(spark, table, url) === 0L)
      assert(gets.get() === 2)
      // the URL refreshed IN PLACE with a newer (higher-slot) incremental
      // must still apply — this is why re-delivery re-fetches instead of
      // skipping on the filename
      val fx2 = SnapshotFixture.generate(SnapshotFixture.Spec(seed = 14L,
        baseSlot = fx.manifest.slot + 10, isDelta = true))
      val file2 = s"$dir/snap2.tar.zst"
      SnapshotFixture.writeArchive(fx2, file2)
      served = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file2))
      assert(graft.streaming.SnapshotReplay.applySnapshot(spark, table, url) > 0L)
      assert(table.snapshot().txns("snapshot-replay") === fx2.manifest.slot)
      // staging dir is cleaned up
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tableDir/t/_staging")) ||
        java.nio.file.Files.list(java.nio.file.Paths.get(s"$tableDir/t/_staging")).count() === 0)
    } finally server.stop(0)
  }
}
