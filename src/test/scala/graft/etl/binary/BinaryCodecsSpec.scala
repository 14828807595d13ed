package graft.etl.binary

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.model._

class Base58Spec extends AnyFunSuite {
  test("known vectors") {
    assert(Base58.encode(Array[Byte]()) === "")
    assert(Base58.encode("hello".getBytes("US-ASCII")) === "Cn8eVZg")
    assert(Base58.encode(Array[Byte](0, 0, 1)) === "112")
    assert(Base58.decode("Cn8eVZg").toSeq === "hello".getBytes("US-ASCII").toSeq)
    // the SPL token program id round-trips to its canonical form
    assert(Base58.encode(SplToken.ProgramId) === "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA")
    assert(SplToken.ProgramId.length === 32)
    assert(BorshMetadata.ProgramId.length === 32)
  }
  test("round-trip arbitrary bytes (seeded property sweep)") {
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(bytes)
      if (rnd.nextBoolean() && bytes.nonEmpty) bytes(0) = 0 // leading-zero path
      assert(Base58.decode(Base58.encode(bytes)).toSeq === bytes.toSeq)
    }
  }
}

object Fx {
  def pk(seed: Int): Array[Byte] = Array.tabulate[Byte](32)(i => ((seed + i * 7) & 0xff).toByte)
  def acct(seed: Int, slot: Long = 1L, wv: Long = 1L, dataLen: Int = 5,
           owner: Array[Byte] = pk(99), exec: Boolean = false): AccountUpdate =
    AccountUpdate(
      pubkey = pk(seed), slot = slot, writeVersion = wv, dataLen = dataLen.toLong,
      owner = owner, lamports = seed * 1000L, executable = exec,
      rentEpoch = 7L, hash = pk(seed + 1),
      data = Array.tabulate[Byte](dataLen)(i => ((seed * 31 + i) & 0xff).toByte))
}

class AppendVecCodecSpec extends AnyFunSuite {
  import Fx._

  test("encode/decode round-trip with 8-byte alignment") {
    val recs = Seq(acct(1, dataLen = 0), acct(2, dataLen = 1), acct(3, dataLen = 7),
      acct(4, dataLen = 8), acct(5, dataLen = 165))
    val (bytes, currentLen) = AppendVecCodec.encode(recs)
    assert(currentLen % 8 === 0)
    val out = AppendVecCodec.decode(bytes, slot = 1L, currentLen).toSeq
    assert(out.size === recs.size)
    recs.zip(out).foreach { case (a, b) =>
      assert(a.pubkey.toSeq === b.pubkey.toSeq)
      assert(a.writeVersion === b.writeVersion)
      assert(a.dataLen === b.dataLen)
      assert(a.owner.toSeq === b.owner.toSeq)
      assert(a.lamports === b.lamports)
      assert(a.executable === b.executable)
      assert(a.rentEpoch === b.rentEpoch)
      assert(a.hash.toSeq === b.hash.toSeq)
      assert(a.data.toSeq === b.data.toSeq)
    }
  }

  test("absolute on-disk offsets match the repr(Rust) align-descending layout " +
    "(hand-authored bytes, independent of the encoder)") {
    // Layout per rustc's align-descending field ordering of the reference's
    // repr(Rust) structs (append_vec.rs:53-74), frozen as repr(C) in later
    // solana-accounts-db and read at the same offsets by Firedancer:
    //   0  write_version u64 | 8 data_len u64 | 16 pubkey[32]
    //   48 lamports u64 | 56 rent_epoch u64 | 64 owner[32] | 96 executable u8
    //   104 hash[32] | 136 data
    val data = Array[Byte](0x11, 0x22, 0x33)
    val buf = java.nio.ByteBuffer.allocate(AppendVecCodec.align8(136 + data.length))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(0, 0x0102030405060708L)              // write_version
    buf.putLong(8, data.length.toLong)               // data_len
    (0 until 32).foreach(i => buf.put(16 + i, (0x40 + i).toByte)) // pubkey
    buf.putLong(48, 987654321L)                      // lamports
    buf.putLong(56, 361L)                            // rent_epoch
    (0 until 32).foreach(i => buf.put(64 + i, (0x80 + i).toByte)) // owner
    buf.put(96, 1.toByte)                            // executable
    (0 until 32).foreach(i => buf.put(104 + i, (0xc0 + i).toByte)) // hash
    data.indices.foreach(i => buf.put(136 + i, data(i)))
    val bytes = buf.array()
    val out = AppendVecCodec.decode(bytes, slot = 5L, bytes.length.toLong).toSeq
    assert(out.size === 1)
    val r = out.head
    assert(r.writeVersion === 0x0102030405060708L)
    assert(r.dataLen === 3L)
    assert(r.pubkey.toSeq === (0 until 32).map(i => (0x40 + i).toByte))
    assert(r.lamports === 987654321L)
    assert(r.rentEpoch === 361L)
    assert(r.owner.toSeq === (0 until 32).map(i => (0x80 + i).toByte))
    assert(r.executable === true)
    assert(r.hash.toSeq === (0 until 32).map(i => (0xc0 + i).toByte))
    assert(r.data.toSeq === data.toSeq)
    // and the encoder produces exactly these bytes (co-drift guard)
    val (encoded, _) = AppendVecCodec.encode(Seq(r))
    assert(encoded.toSeq === bytes.toSeq)
  }

  test("trailing garbage past current_len is ignored (archived.rs:127-130)") {
    val (bytes, currentLen) = AppendVecCodec.encode(Seq(acct(1), acct(2)), trailingGarbage = 300)
    assert(bytes.length > currentLen)
    assert(AppendVecCodec.decode(bytes, 1L, currentLen).size === 2)
  }

  test("scan stops at first incomplete record (append_vec.rs:221-224)") {
    val (bytes, currentLen) = AppendVecCodec.encode(Seq(acct(1, dataLen = 40), acct(2, dataLen = 40)))
    // truncate current_len into the middle of the second record
    assert(AppendVecCodec.decode(bytes, 1L, currentLen - 8).size === 1)
    // and into the middle of the first header
    assert(AppendVecCodec.decode(bytes, 1L, 100).isEmpty)
  }

  test("validation guards (append_vec.rs:138-160)") {
    val (bytes, currentLen) = AppendVecCodec.encode(Seq(acct(1)))
    intercept[IllegalArgumentException](AppendVecCodec.validate(0, 0))
    intercept[IllegalArgumentException](AppendVecCodec.validate(100, 200))
    intercept[IllegalArgumentException](
      AppendVecCodec.decode(bytes, 1L, currentLen + 1000).toSeq)
  }
}

class ManifestCodecSpec extends AnyFunSuite {
  test("round-trip incl. is_delta and trailing bytes allowed") {
    val m = SnapshotManifest(slot = 123L, writeVersion = 42L, isDelta = true,
      bankHash = Fx.pk(9),
      entries = Seq(ManifestEntry(10, 0, 800), ManifestEntry(10, 1, 96), ManifestEntry(11, 0, 0)))
    val bytes = ManifestCodec.encode(m)
    val withTrailer = bytes ++ Array.fill[Byte](64)(0x77)
    val out = ManifestCodec.decode(withTrailer)
    assert(out.slot === m.slot)
    assert(out.writeVersion === m.writeVersion)
    assert(out.isDelta === m.isDelta)
    assert(out.bankHash.toSeq === m.bankHash.toSeq)
    assert(out.entries.toSet === m.entries.toSet)
    assert(out.lengthMap((10L, 1L)) === 96L)
  }
  test("truncation fails loudly") {
    val m = SnapshotManifest(1, 1, isDelta = false, Fx.pk(1), Seq(ManifestEntry(1, 0, 8)))
    val bytes = ManifestCodec.encode(m)
    intercept[java.io.EOFException](ManifestCodec.decode(bytes.take(bytes.length - 10)))
  }
}

/** The REAL manifest format: bincode DeserializableVersionedBank +
  * AccountsDbFields (solana.rs:42-119). */
class SolanaManifestCodecSpec extends AnyFunSuite {
  private def mk(isDelta: Boolean) = SnapshotManifest(
    slot = 1234567L, writeVersion = 987654L, isDelta = isDelta,
    bankHash = Fx.pk(9),
    entries = Seq(ManifestEntry(100, 0, 800), ManifestEntry(100, 3, 96),
      ManifestEntry(101, 1, 0)))

  test("bincode round-trip: slot, write_version, is_delta, bank hash, storage map") {
    Seq(true, false).foreach { delta =>
      val m = mk(delta)
      val out = SolanaManifestCodec.decode(SolanaManifestCodec.encode(m))
      assert(out.slot === m.slot)
      assert(out.writeVersion === m.writeVersion)
      assert(out.isDelta === delta)
      assert(out.bankHash.toSeq === m.bankHash.toSeq)
      assert(out.entries.toSet === m.entries.toSet)
      assert(out.lengthMap((100L, 3L)) === 96L)
    }
  }

  test("trailing bytes allowed (solana.rs:50); default_on_eof tails optional") {
    val m = mk(isDelta = true)
    val bytes = SolanaManifestCodec.encode(m)
    assert(SolanaManifestCodec.decode(bytes ++ Array.fill[Byte](128)(0x55)).slot === m.slot)
    // strip the two default_on_eof vectors the encoder appends:
    // Vec<Slot> with 1 item (8+8) + Vec<(Slot,Hash)> with 1 item (8+40)
    val stripped = bytes.take(bytes.length - (16 + 48))
    val out = SolanaManifestCodec.decode(stripped)
    assert(out.entries.toSet === m.entries.toSet)
    assert(out.writeVersion === m.writeVersion)
  }

  test("truncation inside the bank fails loudly") {
    val bytes = SolanaManifestCodec.encode(mk(isDelta = false))
    intercept[java.io.EOFException](SolanaManifestCodec.decode(bytes.take(200)))
  }

  test("decodes INDEPENDENTLY-AUTHORED bincode bytes (second implementation " +
      "from the solana.rs:63-111 field lists — catches encoder/decoder co-drift)") {
    // A from-scratch byte assembly of DeserializableVersionedBank +
    // AccountsDbFields, written per struct field lists, deliberately using
    // collection shapes the production encoder never emits (empty maps,
    // 2-element vectors, None options, absent default_on_eof tails).
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u64(v: Long): Unit = bos.write(java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array())
    def f64(v: Double): Unit = bos.write(java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v).array())
    def bytes32(fill: Int): Unit = bos.write(Array.fill[Byte](32)(fill.toByte))

    // ---- DeserializableVersionedBank (solana.rs:63-97) ----
    // blockhash_queue: { last_hash_index u64, last_hash Option<Hash>,
    //   ages HashMap<Hash, {FeeCalculator(u64), hash_index u64, ts u64}>, max_age usize }
    u64(7); u8(0) // last_hash = None (encoder always writes Some)
    u64(2); bytes32(0x11); u64(1); u64(2); u64(3)
    bytes32(0x12); u64(4); u64(5); u64(6) // two age entries (encoder writes one)
    u64(150)
    u64(0) // ancestors: EMPTY map (encoder writes one entry)
    bytes32(0x21) // hash
    bytes32(0x22) // parent_hash
    u64(776) // parent_slot
    u64(2); u64(1); u64(9); u64(2); u64(10) // hard_forks: TWO (Slot, usize)
    u64(11); u64(12); u64(13); u64(14); u64(15) // transaction_count..max_tick_height
    u8(0) // hashes_per_tick = None
    u64(64) // ticks_per_slot
    u64(400000000L); u64(0) // ns_per_slot u128
    u64(1600000000L) // genesis_creation_time
    f64(78.3) // slots_per_year
    u64(0) // accounts_data_len
    u64(777) // slot  <-- bank slot
    u64(1) // epoch
    u64(770) // block_height
    bytes32(0x31) // collector_id
    u64(42) // collector_fees
    u64(5000) // fee_calculator
    u64(1); u64(2); u64(3); u64(4); u8(50) // fee_rate_governor (4×u64 + u8)
    u64(9) // collected_rent
    // rent_collector: epoch + EpochSchedule(33) + slots_per_year + Rent(17)
    u64(1)
    u64(432000); u64(432000); u8(1); u64(5); u64(6) // EpochSchedule (33 B, warmup=true)
    f64(78.3)
    u64(3480); f64(2.0); u8(50) // Rent
    u64(432000); u64(432000); u8(0); u64(0); u64(0) // epoch_schedule
    for (i <- 0 until 6) f64(0.1 * i) // inflation
    // stakes: vote_accounts ONE entry w/ 5-byte account data; NO delegations
    u64(1); bytes32(0x41); u64(1000) // pubkey, stake
    u64(99); u64(5); u8(1); u8(2); u8(3); u8(4); u8(5) // Account{lamports, data[5]}
    bytes32(0x42); u8(0); u64(361) // owner, executable=false, rent_epoch
    u64(0) // stake_delegations: EMPTY
    u64(0); u64(1) // unused, epoch
    u64(0) // stake_history: EMPTY
    u64(0); u64(0); u64(0) // unused_accounts: three EMPTY collections
    u64(0) // epoch_stakes: EMPTY (encoder writes one full entry)
    u8(1) // is_delta = true
    // ---- AccountsDbFields (solana.rs:100-111) ----
    u64(2) // two slots
    u64(5); u64(1); u64(0); u64(100) // slot 5 → [(id 0, len 100)]
    u64(7); u64(2); u64(1); u64(200); u64(2); u64(300) // slot 7 → two vecs
    u64(999) // write_version
    u64(777) // slot
    bytes32(0xab) // BankHashInfo.hash
    bytes32(0xac) // snapshot_hash
    for (i <- 0 until 5) u64(50L + i) // BankHashStats
    // default_on_eof vectors ABSENT (EOF here must be tolerated)

    val out = SolanaManifestCodec.decode(bos.toByteArray)
    assert(out.slot === 777L)
    assert(out.writeVersion === 999L)
    assert(out.isDelta === true)
    assert(out.bankHash.toSeq === Array.fill[Byte](32)(0xab.toByte).toSeq)
    assert(out.entries.toSet === Set(
      ManifestEntry(5, 0, 100), ManifestEntry(7, 1, 200), ManifestEntry(7, 2, 300)))
    assert(out.lengthMap((7L, 2L)) === 300L)
  }

  test("ManifestCodec auto-detects bincode vs legacy GSNAP1") {
    val m = mk(isDelta = true)
    val real = ManifestCodec.decode(SolanaManifestCodec.encode(m))
    val legacy = ManifestCodec.decode(ManifestCodec.encode(m))
    assert(real.entries.toSet === legacy.entries.toSet)
    assert(real.slot === legacy.slot && real.isDelta && legacy.isDelta)
  }
}

class SplTokenSpec extends AnyFunSuite {
  import Fx._
  test("token account round-trip, all options set") {
    val t = TokenAccount(pk(1), pk(2), Long.MaxValue, Some(pk(3)), 2,
      Some(1000000000L), 5L, Some(pk(4)))
    val bytes = SplToken.packTokenAccount(t)
    assert(bytes.length === SplToken.TokenAccountSize)
    val out = SplToken.unpackTokenAccount(bytes).get
    assert(out.mint.toSeq === t.mint.toSeq)
    assert(out.owner.toSeq === t.owner.toSeq)
    assert(out.amount === t.amount)
    assert(out.delegate.get.toSeq === pk(3).toSeq)
    assert(out.state === 2)
    assert(out.isNative === Some(1000000000L))
    assert(out.delegatedAmount === 5L)
    assert(out.closeAuthority.get.toSeq === pk(4).toSeq)
  }
  test("token account with all COptions none") {
    val t = TokenAccount(pk(1), pk(2), 0L, None, 1, None, 0L, None)
    val out = SplToken.unpackTokenAccount(SplToken.packTokenAccount(t)).get
    assert(out.delegate.isEmpty && out.isNative.isEmpty && out.closeAuthority.isEmpty)
  }
  test("mint round-trip + u64 wrap kept as-is (sqlite.rs:226-230)") {
    val m = TokenMint(Some(pk(5)), -1L /* u64::MAX as i64 */, 9, isInitialized = true, None)
    val out = SplToken.unpackMint(SplToken.packMint(m)).get
    assert(out.supply === -1L)
    assert(out.mintAuthority.get.toSeq === pk(5).toSeq)
    assert(out.decimals === 9)
    assert(out.isInitialized && out.freezeAuthority.isEmpty)
  }
  test("multisig round-trip: only first n signers kept (sqlite.rs:315-322)") {
    val ms = TokenMultisig(2, 3, (0 until 3).map(i => pk(i)))
    val out = SplToken.unpackMultisig(SplToken.packMultisig(ms)).get
    assert(out.m === 2 && out.n === 3)
    assert(out.signers.size === 3)
    assert(out.signers(1).toSeq === pk(1).toSeq)
  }
  test("wrong sizes are skipped, not errors (sqlite.rs:252-258)") {
    assert(SplToken.unpackTokenAccount(new Array[Byte](100)).isEmpty)
    assert(SplToken.unpackMint(new Array[Byte](165)).isEmpty)
    assert(SplToken.unpackMultisig(new Array[Byte](82)).isEmpty)
  }
  test("uninitialized accounts are rejected like spl_token Pack::unpack " +
      "(reference's `if let Ok`, sqlite.rs:238-251)") {
    // token account: state byte 0 = AccountState::Uninitialized
    val t = TokenAccount(pk(1), pk(2), 7L, None, state = 0, None, 0L, None)
    assert(SplToken.unpackTokenAccount(SplToken.packTokenAccount(t)).isEmpty)
    // mint: is_initialized == false
    val m = TokenMint(None, 1L, 0, isInitialized = false, None)
    assert(SplToken.unpackMint(SplToken.packMint(m)).isEmpty)
    // multisig: is_initialized byte cleared
    val bytes = SplToken.packMultisig(TokenMultisig(1, 1, Seq(pk(3))))
    assert(SplToken.unpackMultisig(bytes).isDefined)
    bytes(2) = 0
    assert(SplToken.unpackMultisig(bytes).isEmpty)
  }
}

class BorshMetadataSpec extends AnyFunSuite {
  import Fx._
  import BorshMetadata._
  private val full = TokenMetadata(pk(1), pk(2), "Name\u0000\u0000", "SYM", "https://x/y",
    500, Some(Seq(Creator(pk(3), verified = true, 100))), primarySaleHappened = true,
    isMutable = false, editionNonce = Some(255), tokenStandard = Some(1),
    collectionVerified = Some(true), collectionKey = Some(pk(6)),
    useMethod = Some(2), usesRemaining = Some(3L), usesTotal = Some(10L))

  test("v1.2 full round-trip preserves NUL padding") {
    val Decoded(out) = decode(encode(full, version = 3)): @unchecked
    assert(out.updateAuthority.toSeq === full.updateAuthority.toSeq)
    assert(out.mint.toSeq === full.mint.toSeq)
    assert(out.name === "Name\u0000\u0000")
    assert(out.symbol === "SYM" && out.uri === "https://x/y")
    assert(out.sellerFeeBasisPoints === 500)
    assert(out.creators.get.size === 1)
    assert(out.creators.get.head.address.toSeq === pk(3).toSeq)
    assert(out.creators.get.head.verified && out.creators.get.head.share === 100)
    assert(out.primarySaleHappened && !out.isMutable)
    assert(out.editionNonce === Some(255.toShort))
    assert(out.tokenStandard === Some(1.toShort))
    assert(out.collectionVerified === Some(true))
    assert(out.collectionKey.get.toSeq === pk(6).toSeq)
    assert(out.useMethod === Some(2.toShort))
    assert(out.usesRemaining === Some(3L) && out.usesTotal === Some(10L))
  }

  test("v1.2 tail is ALL-or-nothing: truncation mid-uses rolls back to v1.1 " +
      "(mpl_metadata.rs:33-38, sqlite.rs:344-347)") {
    val bytes = encode(full, version = 3)
    // uses tail = 1 (Some) + 1 (use_method) + 8 + 8 = 18 bytes; cut inside it
    val cutMidUses = bytes.take(bytes.length - 9)
    val Decoded(out) = decode(cutMidUses): @unchecked
    assert(out.editionNonce === Some(255.toShort))      // v1.1 kept
    assert(out.tokenStandard.isEmpty)                   // whole v1.2 dropped
    assert(out.collectionVerified.isEmpty && out.collectionKey.isEmpty)
    assert(out.useMethod.isEmpty && out.usesRemaining.isEmpty)
    // truncation between collection and uses also rolls back the whole tail
    val cutBeforeUses = bytes.take(bytes.length - 18)
    val Decoded(out2) = decode(cutBeforeUses): @unchecked
    assert(out2.tokenStandard.isEmpty && out2.collectionKey.isEmpty)
    assert(out2.editionNonce === Some(255.toShort))
  }
  test("progressive-tail truncation: v1 and v1.1 decode with null tails (sqlite.rs:344-347)") {
    val Decoded(v1) = decode(encode(full, version = 1)): @unchecked
    assert(v1.editionNonce.isEmpty && v1.tokenStandard.isEmpty && v1.collectionKey.isEmpty)
    assert(v1.name === full.name && v1.sellerFeeBasisPoints === 500)
    val Decoded(v11) = decode(encode(full, version = 2)): @unchecked
    assert(v11.editionNonce === Some(255.toShort) && v11.tokenStandard.isEmpty)
  }
  test("guards: empty → skip, wrong key → skip, bad body → malformed (sqlite.rs:327-357)") {
    assert(decode(Array.emptyByteArray) === Skip)
    assert(decode(Array[Byte](3, 1, 2)) === Skip)
    val truncatedBody = encode(full, version = 1).take(40)
    assert(decode(truncatedBody).isInstanceOf[Malformed])
  }
}
