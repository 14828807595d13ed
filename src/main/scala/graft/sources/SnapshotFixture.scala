package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable
import scala.util.Random

import com.github.luben.zstd.ZstdOutputStream
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}

import graft.etl.binary.{AppendVecCodec, BorshMetadata, SolanaManifestCodec, SplToken}
import graft.etl.model._

/** Deterministic synthetic snapshot generator (FIXTURES.md §1) — the
  * reference ships zero tests/fixtures (SURVEY.md §5), so this writer is the
  * golden-input source for the whole engine. Same content emitted in both
  * shapes the reference accepts (main.rs:202-213): an unpacked dir and a
  * `.tar.zst` archive (manifest entry first, archived.rs:46-58).
  *
  * Content (seeded): duplicate pubkeys across slots with increasing
  * write_version (exercises LWW), ~70% SPL-token owners (hot-owner skew),
  * payloads covering valid 165/82/355-byte SPL structs, borsh metadata at
  * v1/v1.1/v1.2 truncations, wrong-size token payloads (warn-skip path),
  * and executable ELF-stub accounts (programs sink).
  */
object SnapshotFixture {

  val BpfLoaderId: Array[Byte] = graft.etl.binary.Base58.decode(
    "BPFLoader2111111111111111111111111111111111")

  /** Bump whenever the on-disk byte format of generated fixtures changes
    * (codec layout, manifest encoding, generator logic): the bench input
    * caches in tmpfs key their DONE markers on this, so a stale input from
    * an older format can never be silently decoded as garbage. v2 = the
    * align-descending AppendVec layout fix. */
  final val FormatVersion = "v2"

  final case class Spec(
      seed: Long = 42L,
      slots: Int = 4,
      vecsPerSlot: Int = 2,
      accountsPerVec: Int = 25,
      pubkeyPool: Int = 60, // < total accounts ⇒ cross-slot duplicates
      tokenOwnerFraction: Double = 0.7,
      baseSlot: Long = 100L,
      isDelta: Boolean = false,
      /** hot-key skew (SkewBench): this fraction of records hits one of
        * `hotKeys` pubkeys (0.0 = uniform; the extra random draw is only
        * consumed when > 0, so existing fixtures are byte-stable). */
      hotKeyFraction: Double = 0.0,
      hotKeys: Int = 4)

  final case class Fixture(
      manifest: SnapshotManifest,
      /** per (slot,id): records in arrival order */
      vecs: Seq[(Long, Long, Seq[AccountUpdate], Int)], // + trailing garbage bytes
      /** LWW oracle: max (writeVersion, slot) per pubkey, computed by an
        * independent in-memory fold. */
      expectedFinal: Map[Seq[Byte], AccountUpdate]) {
    def allRecords: Seq[AccountUpdate] = vecs.flatMap(_._3)
  }

  def pkFromLong(i: Long): Array[Byte] = {
    val b = new Array[Byte](32)
    var v = i; var j = 0
    while (j < 8) { b(j) = (v & 0xff).toByte; v >>= 8; j += 1 }
    b(31) = 0x7e.toByte
    b
  }

  def generate(spec: Spec, startWriteVersion: Long = 0L): Fixture = {
    val rnd = new Random(spec.seed)
    var wv = startWriteVersion
    val vecs = mutable.ArrayBuffer[(Long, Long, Seq[AccountUpdate], Int)]()
    for (s <- 0 until spec.slots; v <- 0 until spec.vecsPerSlot) {
      val slot = spec.baseSlot + s
      val recs = (0 until spec.accountsPerVec).map { _ =>
        wv += 1
        mkAccount(rnd, pkFromLong(rnd.nextInt(spec.pubkeyPool).toLong), slot, wv, spec)
      }
      val garbage = if ((s + v) % 3 == 0) 64 else 0 // current_len < file size cases
      vecs += ((slot, v.toLong, recs, garbage))
    }
    val entries = vecs.map { case (slot, id, recs, g) =>
      val (_, currentLen) = AppendVecCodec.encode(recs, g)
      ManifestEntry(slot, id, currentLen)
    }
    val manifest = SnapshotManifest(
      slot = spec.baseSlot + spec.slots - 1,
      writeVersion = wv,
      isDelta = spec.isDelta,
      bankHash = pkFromLong(spec.seed),
      entries = entries.toSeq)
    val expected = mutable.Map[Seq[Byte], AccountUpdate]()
    vecs.flatMap(_._3).foreach { r =>
      val k = r.pubkey.toSeq
      expected.get(k) match {
        case Some(prev) if Ordering[(Long, Long)].gt(
          (prev.writeVersion, prev.slot), (r.writeVersion, r.slot)) => ()
        case _ => expected(k) = r
      }
    }
    Fixture(manifest, vecs.toSeq, expected.toMap)
  }

  private def mkAccount(rnd: Random, pubkey: Array[Byte], slot: Long, wv: Long,
      spec: Spec): AccountUpdate = {
    val roll = rnd.nextDouble()
    val (owner, data, exec) =
      if (roll < spec.tokenOwnerFraction) {
        // SPL-token-owned: mostly valid token accounts, some mints/multisigs,
        // some wrong-size (warn-skip, sqlite.rs:252-258)
        val kind = rnd.nextInt(10)
        val payload =
          if (kind < 6) SplToken.packTokenAccount(TokenAccount(
            pkFromLong(rnd.nextInt(20).toLong), pkFromLong(1000L + rnd.nextInt(30)),
            rnd.nextLong(1L << 40),
            if (rnd.nextBoolean()) Some(pkFromLong(2000L)) else None,
            1, if (rnd.nextInt(10) == 0) Some(1L) else None,
            0L, None))
          else if (kind < 8) SplToken.packMint(TokenMint(
            Some(pkFromLong(3000L)), rnd.nextLong(1L << 42), (rnd.nextInt(10)).toShort,
            isInitialized = true, None))
          else if (kind == 8) SplToken.packMultisig(TokenMultisig(
            2, (1 + rnd.nextInt(4)).toShort, (0 until 5).map(i => pkFromLong(4000L + i))))
          else { // wrong size
            val junk = new Array[Byte](50 + rnd.nextInt(40)); rnd.nextBytes(junk); junk
          }
        (SplToken.ProgramId, payload, false)
      } else if (roll < spec.tokenOwnerFraction + 0.1) {
        // Metaplex metadata at progressive truncation versions
        val version = 1 + rnd.nextInt(3)
        val meta = TokenMetadata(
          pkFromLong(5000L), pkFromLong(1000L + rnd.nextInt(30)),
          s"NFT-${rnd.nextInt(100)}\u0000\u0000", "SYM", s"ipfs://x${rnd.nextInt(10)}",
          rnd.nextInt(10000), Some(Seq(Creator(pkFromLong(6000L), verified = true, 100))),
          rnd.nextBoolean(), rnd.nextBoolean(),
          editionNonce = Some((rnd.nextInt(255)).toShort), tokenStandard = Some(1),
          collectionVerified = Some(true), collectionKey = Some(pkFromLong(7000L)),
          useMethod = Some(1), usesRemaining = Some(rnd.nextInt(10).toLong),
          usesTotal = Some(10L))
        (BorshMetadata.ProgramId, BorshMetadata.encode(meta, version), false)
      } else if (roll < spec.tokenOwnerFraction + 0.15) {
        // executable ELF stub (programs sink, programs.rs:33-37)
        val elf = Array[Byte](0x7f, 'E', 'L', 'F') ++ Array.fill(60)(rnd.nextInt(256).toByte)
        (BpfLoaderId, elf, true)
      } else {
        // plain system account with opaque payload
        val data = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(data)
        (pkFromLong(9000L + rnd.nextInt(5)), data, false)
      }
    AccountUpdate(pubkey, slot, wv, data.length.toLong, owner,
      lamports = rnd.nextLong(1L << 45), executable = exec,
      rentEpoch = 7L, hash = pkFromLong(wv), data = data)
  }

  // ---------------- writers ----------------

  /** Unpacked tree: accounts/<slot>.<id>, snapshots/status_cache,
    * snapshots/<slot>/<slot> (unpacked.rs:28-77). Optionally plants an
    * on-disk vec absent from the manifest (UnexpectedAppendVec test). */
  def writeUnpacked(fx: Fixture, dir: String, plantUnexpectedVec: Boolean = false): Unit = {
    val root = Paths.get(dir)
    Files.createDirectories(root.resolve("accounts"))
    Files.createDirectories(root.resolve(s"snapshots/${fx.manifest.slot}"))
    Files.write(root.resolve("snapshots/status_cache"), Array.emptyByteArray)
    Files.write(root.resolve(s"snapshots/${fx.manifest.slot}/${fx.manifest.slot}"),
      SolanaManifestCodec.encode(fx.manifest))
    fx.vecs.foreach { case (slot, id, recs, garbage) =>
      val (bytes, _) = AppendVecCodec.encode(recs, garbage)
      Files.write(root.resolve(s"accounts/$slot.$id"), bytes)
    }
    if (plantUnexpectedVec) {
      val (bytes, _) = AppendVecCodec.encode(fx.vecs.head._3.take(1))
      Files.write(root.resolve("accounts/999999.7"), bytes)
    }
  }

  /** `.tar.zst` archive with the manifest entry before all vecs
    * (archived.rs:46-58). */
  def writeArchive(fx: Fixture, file: String): Unit = {
    val out = new TarArchiveOutputStream(new ZstdOutputStream(
      new BufferedOutputStream(new FileOutputStream(file), 1 << 16)))
    out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    def put(name: String, bytes: Array[Byte]): Unit = {
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    }
    put("version", "1.2.0".getBytes("US-ASCII"))
    put(s"snapshots/status_cache", Array.emptyByteArray)
    put(s"snapshots/${fx.manifest.slot}/${fx.manifest.slot}", SolanaManifestCodec.encode(fx.manifest))
    fx.vecs.foreach { case (slot, id, recs, garbage) =>
      val (bytes, _) = AppendVecCodec.encode(recs, garbage)
      put(s"accounts/$slot.$id", bytes)
    }
    out.close()
  }

  /** Bench-scale streaming writer: generates and writes one unpacked
    * snapshot WITHOUT holding all records in memory (per-vec batches only).
    * Unpacked (not archived) so decode parallelism = vec count — archives
    * are sequential by format (archived.rs:41-43). Returns (records, lastWv).
    */
  def writeLargeUnpacked(dir: String, spec: Spec, startWriteVersion: Long): (Long, Long) = {
    val root = Paths.get(dir)
    Files.createDirectories(root.resolve("accounts"))
    val manifestSlot = spec.baseSlot + spec.slots - 1
    Files.createDirectories(root.resolve(s"snapshots/$manifestSlot"))
    Files.write(root.resolve("snapshots/status_cache"), Array.emptyByteArray)
    // deterministic per-vec seeds ⇒ vecs generate & write in parallel
    val vecIds = (for (s <- 0 until spec.slots; v <- 0 until spec.vecsPerSlot) yield (s, v)).zipWithIndex
    val perVec = spec.accountsPerVec
    val entries = new Array[ManifestEntry](vecIds.size)
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, Runtime.getRuntime.availableProcessors())))
    val futures = vecIds.map { case ((s, v), idx) =>
      Future {
        val slot = spec.baseSlot + s
        val rnd = new Random(spec.seed * 1000003L + idx)
        var wv = startWriteVersion + idx.toLong * perVec
        val recs = (0 until perVec).map { _ =>
          wv += 1
          val pk =
            if (spec.hotKeyFraction > 0 && rnd.nextDouble() < spec.hotKeyFraction)
              pkFromLong(rnd.nextInt(spec.hotKeys).toLong)
            else pkFromLong(rnd.nextInt(spec.pubkeyPool).toLong)
          mkAccount(rnd, pk, slot, wv, spec)
        }
        val (bytes, currentLen) = AppendVecCodec.encode(recs)
        Files.write(root.resolve(s"accounts/$slot.$v"), bytes)
        entries(idx) = ManifestEntry(slot, v.toLong, currentLen)
      }
    }
    Await.result(Future.sequence(futures), Duration.Inf)
    ec.asInstanceOf[scala.concurrent.ExecutionContextExecutorService].shutdown()
    val wv = startWriteVersion + vecIds.size.toLong * perVec
    val total = vecIds.size.toLong * perVec
    val manifest = SnapshotManifest(manifestSlot, wv, spec.isDelta, pkFromLong(spec.seed),
      entries.toSeq)
    Files.write(root.resolve(s"snapshots/$manifestSlot/$manifestSlot"),
      SolanaManifestCodec.encode(manifest))
    (total, wv)
  }

  /** Full + K incremental fixtures forming one CDC replay stream: write
    * versions keep increasing across snapshots; later snapshots overwrite a
    * subset of keys (is_delta = true, solana.rs:96). Returns the fixtures in
    * replay order plus the combined LWW oracle. */
  def generateStream(seed: Long, increments: Int,
      spec: Spec = Spec()): (Seq[Fixture], Map[Seq[Byte], AccountUpdate]) = {
    var wv = 0L
    val fixtures = (0 to increments).map { i =>
      val s = spec.copy(
        seed = seed + i,
        isDelta = i > 0,
        baseSlot = spec.baseSlot + i * spec.slots,
        slots = if (i == 0) spec.slots else math.max(1, spec.slots / 2),
        accountsPerVec = if (i == 0) spec.accountsPerVec else math.max(4, spec.accountsPerVec / 2))
      val fx = generate(s, startWriteVersion = wv)
      wv = fx.manifest.writeVersion
      fx
    }
    val expected = mutable.Map[Seq[Byte], AccountUpdate]()
    fixtures.flatMap(_.allRecords).foreach { r =>
      val k = r.pubkey.toSeq
      expected.get(k) match {
        case Some(prev) if Ordering[(Long, Long)].gt(
          (prev.writeVersion, prev.slot), (r.writeVersion, r.slot)) => ()
        case _ => expected(k) = r
      }
    }
    (fixtures, expected.toMap)
  }
}
