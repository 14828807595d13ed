package graft.etl.binary

import java.io.{ByteArrayOutputStream, EOFException, InputStream}
import java.nio.{ByteBuffer, ByteOrder}

import graft.etl.model.{ManifestEntry, SnapshotManifest}

/** Bincode (fixint, little-endian) codec for the REAL Solana snapshot
  * manifest stream the reference parses: a `DeserializableVersionedBank`
  * followed by `AccountsDbFields<SerializableAccountStorageEntry>`
  * (/root/reference/src/solana.rs:42-119, invoked at archived.rs:66-73 and
  * unpacked.rs:55-62; solana-runtime/-sdk 1.11.3 struct layouts per the
  * reference's Cargo.toml pin).
  *
  * Bincode-fixint wire primitives: u64/usize = 8 B LE; u128 = 16 B LE;
  * f64 = 8 B IEEE LE; bool/u8 = 1 B; Option<T> = u8 tag (0/1) + value;
  * Vec/HashMap/HashSet/String = u64 count + items; tuples/structs = fields
  * in declaration order; no alignment, no per-field tags.
  *
  * The reference decodes the bank only to advance the stream (it drops the
  * value, archived.rs:67); the two fields that matter downstream are
  * `slot` (solana.rs:81) and `is_delta` (solana.rs:96). The decoder here is
  * therefore a STRUCTURAL SKIP of every bank field — each nested layout
  * spelled out below with its source struct — capturing just those two,
  * then a real decode of `AccountsDbFields`:
  * field 0 map slot→[(id, accounts_current_len)] (solana.rs:100-111,
  * 115-119), field 1 write_version, field 2 slot, field 3 `BankHashInfo`
  * {hash, snapshot_hash, stats(5×u64)}, fields 4-5 `default_on_eof`
  * root-slot vectors (EOF-tolerant, solana.rs:105-110). Trailing bytes are
  * allowed (solana.rs:50, `allow_trailing_bytes`); the stream guard is
  * 32 GiB (solana.rs:40).
  *
  * The encoder mirrors the exact same field order with small deterministic
  * collections (one entry each), giving the offline fixture the reference
  * never shipped (SURVEY.md §5).
  */
object SolanaManifestCodec {

  /** 32 GiB manifest stream guard (solana.rs:40). */
  final val MaxStreamSize: Long = 32L * 1024 * 1024 * 1024

  // ---------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): SnapshotManifest =
    decode(new java.io.ByteArrayInputStream(bytes))

  def decode(in: InputStream): SnapshotManifest = {
    val r = new Reader(in)
    val (bankSlot, isDelta) = skipBank(r)
    // ---- AccountsDbFields (solana.rs:100-111) ----
    val nSlots = r.u64()
    require(nSlots >= 0 && nSlots < Int.MaxValue, s"bad storage-map size $nSlots")
    val entries = Seq.newBuilder[ManifestEntry]
    var i = 0L
    while (i < nSlots) {
      val slot = r.u64()
      val nVecs = r.u64()
      require(nVecs >= 0 && nVecs < Int.MaxValue, s"bad vec count $nVecs for slot $slot")
      var v = 0L
      while (v < nVecs) {
        val id = r.u64()              // SerializedAppendVecId (usize)
        val currentLen = r.u64()      // accounts_current_len (usize)
        entries += ManifestEntry(slot, id, currentLen)
        v += 1
      }
      i += 1
    }
    val writeVersion = r.u64()        // StoredMetaWriteVersion (solana.rs:102)
    val slot = r.u64()                // Slot (solana.rs:103)
    val bankHash = r.bytes(32)        // BankHashInfo.hash
    r.skip(32)                        // BankHashInfo.snapshot_hash
    r.skip(40)                        // BankHashStats: 5 × u64
    // fields 4/5: default_on_eof root-slot vectors — tolerate EOF anywhere
    try {
      val n4 = r.u64(); r.skip(n4 * 8)            // Vec<Slot>
      val n5 = r.u64(); r.skip(n5 * 40)           // Vec<(Slot, Hash)>
    } catch { case _: EOFException => () }
    // bankSlot (solana.rs:81) equals the accounts-db slot in real snapshots;
    // field 2 of AccountsDbFields is the authoritative one downstream
    val _ = bankSlot
    SnapshotManifest(slot, writeVersion, isDelta, bankHash, entries.result())
  }

  /** Structural skip of `DeserializableVersionedBank` (solana.rs:63-97),
    * returning (slot, is_delta). Each line cites the nested struct whose
    * serde layout it walks. */
  private def skipBank(r: Reader): (Long, Boolean) = {
    // blockhash_queue: BlockhashQueue { last_hash_index u64,
    //   last_hash Option<Hash>, ages HashMap<Hash, HashAge{FeeCalculator(u64),
    //   hash_index u64, timestamp u64}>, max_age usize }
    r.skip(8)
    r.option(() => r.skip(32))
    r.seq(() => { r.skip(32); r.skip(24) })
    r.skip(8)
    // ancestors: AncestorsForSerialization = HashMap<Slot, usize>
    r.seq(() => r.skip(16))
    r.skip(32)                        // hash
    r.skip(32)                        // parent_hash
    r.skip(8)                         // parent_slot
    r.seq(() => r.skip(16))           // hard_forks: Vec<(Slot, usize)>
    r.skip(8 * 5)                     // transaction_count..max_tick_height
    r.option(() => r.skip(8))         // hashes_per_tick: Option<u64>
    r.skip(8)                         // ticks_per_slot
    r.skip(16)                        // ns_per_slot: u128
    r.skip(8)                         // genesis_creation_time: i64
    r.skip(8)                         // slots_per_year: f64
    r.skip(8)                         // accounts_data_len: u64
    val slot = r.u64()                // slot (solana.rs:81)
    r.skip(8)                         // epoch
    r.skip(8)                         // block_height
    r.skip(32)                        // collector_id: Pubkey
    r.skip(8)                         // collector_fees
    r.skip(8)                         // fee_calculator: FeeCalculator { u64 }
    // fee_rate_governor: FeeRateGovernor — lamports_per_signature is
    // #[serde(skip)] in solana-sdk 1.11, so 4 × u64 + burn_percent u8
    r.skip(8 * 4 + 1)
    r.skip(8)                         // collected_rent
    // rent_collector: RentCollector { epoch u64, epoch_schedule
    //   EpochSchedule(33), slots_per_year f64, rent Rent{u64, f64, u8} }
    r.skip(8 + 33 + 8 + 17)
    r.skip(33)                        // epoch_schedule: EpochSchedule
    r.skip(48)                        // inflation: 6 × f64
    skipStakes(r)                     // stakes: Stakes<Delegation>
    // unused_accounts: { HashSet<Pubkey>, HashSet<Pubkey>, HashMap<Pubkey,u64> }
    r.seq(() => r.skip(32))
    r.seq(() => r.skip(32))
    r.seq(() => r.skip(40))
    // epoch_stakes: HashMap<Epoch, EpochStakes>
    r.seq(() => {
      r.skip(8)                       // epoch key
      skipStakes(r)                   // EpochStakes.stakes
      r.skip(8)                       // total_stake
      // node_id_to_vote_accounts: HashMap<Pubkey, NodeVoteAccounts
      //   { vote_accounts: Vec<Pubkey>, total_stake: u64 }>
      r.seq(() => { r.skip(32); r.seq(() => r.skip(32)); r.skip(8) })
      r.seq(() => r.skip(64))         // epoch_authorized_voters: Pubkey→Pubkey
    })
    val isDelta = r.bool()            // is_delta (solana.rs:96)
    (slot, isDelta)
  }

  /** Stakes<Delegation> (solana-runtime 1.11 stakes.rs):
    * { vote_accounts: HashMap<Pubkey, (u64, Account)>, stake_delegations:
    *   HashMap<Pubkey, Delegation(104)>, unused u64, epoch u64,
    *   stake_history: Vec<(Epoch, StakeHistoryEntry(24))> }.
    * Account (the one dynamic payload): { lamports u64, data Vec<u8>,
    * owner Pubkey, executable bool, rent_epoch u64 }. */
  private def skipStakes(r: Reader): Unit = {
    r.seq(() => {                     // vote_accounts
      r.skip(32)                      // pubkey
      r.skip(8)                       // stake
      r.skip(8)                       // Account.lamports
      val dataLen = r.u64()           // Account.data
      r.skip(dataLen)
      r.skip(32 + 1 + 8)              // owner, executable, rent_epoch
    })
    r.seq(() => r.skip(32 + 32 + 8 * 3 + 8)) // stake_delegations: Pubkey → Delegation
    r.skip(8)                         // unused
    r.skip(8)                         // epoch
    r.seq(() => r.skip(8 + 24))       // stake_history
  }

  // ---------------------------------------------------------------- encode

  /** Fixture encoder: the same field order with deterministic minimal
    * collections (one element each, so the structural skip logic is
    * actually exercised — empty collections would vacuously pass). */
  def encode(m: SnapshotManifest, seed: Long = 7L): Array[Byte] = {
    val w = new Writer
    val pk = fillBytes(32, seed)
    val hash32 = fillBytes(32, seed + 1)
    // ---- DeserializableVersionedBank ----
    w.u64(5)                          // blockhash_queue.last_hash_index
    w.option(Some(() => w.bytes(hash32)))             // last_hash
    w.seq(1) { w.bytes(hash32); w.u64(1); w.u64(2); w.u64(3) } // ages
    w.u64(300)                        // max_age
    w.seq(1) { w.u64(m.slot); w.u64(1) }              // ancestors
    w.bytes(hash32)                   // hash
    w.bytes(fillBytes(32, seed + 2))  // parent_hash
    w.u64(if (m.slot > 0) m.slot - 1 else 0)          // parent_slot
    w.seq(1) { w.u64(1); w.u64(1) }   // hard_forks
    w.u64(1000); w.u64(64); w.u64(900); w.u64(1L << 40); w.u64(128)
    w.option(Some(() => w.u64(12500)))                // hashes_per_tick
    w.u64(64)                         // ticks_per_slot
    w.u128(400000000L)                // ns_per_slot
    w.u64(1609459200L)                // genesis_creation_time
    w.f64(78.3)                       // slots_per_year
    w.u64(0)                          // accounts_data_len
    w.u64(m.slot)                     // slot
    w.u64(m.slot / 432000)            // epoch
    w.u64(m.slot)                     // block_height
    w.bytes(pk)                       // collector_id
    w.u64(42)                         // collector_fees
    w.u64(5000)                       // fee_calculator
    w.u64(10000); w.u64(20000); w.u64(0); w.u64(100000); w.u8(50) // fee_rate_governor
    w.u64(7)                          // collected_rent
    // rent_collector
    w.u64(m.slot / 432000); encodeEpochSchedule(w); w.f64(78.3)
    w.u64(3480); w.f64(2.0); w.u8(50) // rent
    encodeEpochSchedule(w)            // epoch_schedule
    for (i <- 0 until 6) w.f64(0.15 - i * 0.01)       // inflation
    encodeStakes(w, pk, seed)         // stakes
    w.seq(1)(w.bytes(pk))             // unused_accounts.unused1
    w.seq(1)(w.bytes(fillBytes(32, seed + 3)))        // unused2
    w.seq(1) { w.bytes(pk); w.u64(9) }                // unused3
    w.seq(1) {                        // epoch_stakes (one epoch)
      w.u64(m.slot / 432000)
      encodeStakes(w, pk, seed + 4)
      w.u64(1L << 30)
      w.seq(1) { w.bytes(pk); w.seq(1)(w.bytes(pk)); w.u64(1L << 20) }
      w.seq(1) { w.bytes(pk); w.bytes(pk) }
    }
    w.bool(m.isDelta)                 // is_delta
    // ---- AccountsDbFields ----
    val bySlot = m.entries.groupBy(_.slot).toSeq.sortBy(_._1)
    w.u64(bySlot.size.toLong)
    bySlot.foreach { case (slot, vecs) =>
      w.u64(slot)
      w.u64(vecs.size.toLong)
      vecs.sortBy(_.id).foreach { v => w.u64(v.id); w.u64(v.currentLen) }
    }
    w.u64(m.writeVersion)
    w.u64(m.slot)
    require(m.bankHash.length == 32)
    w.bytes(m.bankHash)               // BankHashInfo.hash
    w.bytes(fillBytes(32, seed + 5))  // snapshot_hash
    for (i <- 0 until 5) w.u64(100L + i)              // BankHashStats
    w.seq(1)(w.u64(m.slot))           // historical roots (default_on_eof)
    w.seq(1) { w.u64(m.slot); w.bytes(hash32) }       // roots with hashes
    w.result()
  }

  private def encodeEpochSchedule(w: Writer): Unit = {
    w.u64(432000); w.u64(432000); w.bool(false); w.u64(0); w.u64(0)
  }

  private def encodeStakes(w: Writer, pk: Array[Byte], seed: Long): Unit = {
    w.seq(1) {                        // vote_accounts: one (pubkey, (stake, Account))
      w.bytes(pk); w.u64(1L << 20)
      w.u64(100); w.u64(3); w.u8(1); w.u8(2); w.u8(3) // Account{lamports, data=[1,2,3]
      w.bytes(fillBytes(32, seed + 6)); w.bool(false); w.u64(361) // owner, exec, rent_epoch
    }
    w.seq(1) {                        // stake_delegations: one Delegation
      w.bytes(fillBytes(32, seed + 7))
      w.bytes(pk); w.u64(500); w.u64(1); w.u64(Long.MaxValue); w.f64(0.25)
    }
    w.u64(0)                          // unused
    w.u64(1)                          // epoch
    w.seq(1) { w.u64(1); w.u64(10); w.u64(5); w.u64(0) } // stake_history
  }

  private def fillBytes(n: Int, seed: Long): Array[Byte] = {
    val b = new Array[Byte](n)
    var v = seed * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < n) { b(i) = (v >>> 56).toByte; v = v * 6364136223846793005L + 1442695040888963407L; i += 1 }
    b
  }

  // ---------------------------------------------------------------- io

  private final class Reader(in: InputStream) {
    private var consumed = 0L
    private val tmp = new Array[Byte](8)

    def u64(): Long = {
      readFully(tmp, 8)
      ByteBuffer.wrap(tmp).order(ByteOrder.LITTLE_ENDIAN).getLong
    }
    def bool(): Boolean = { readFully(tmp, 1); tmp(0) != 0 }
    def bytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); readFully(b, n); b
    }
    def option(skipValue: () => Unit): Unit = if (bool()) skipValue()
    /** u64 count + count × item (Vec/HashMap/HashSet/String). */
    def seq(item: () => Unit): Unit = {
      val n = u64()
      require(n >= 0 && n < Int.MaxValue, s"bad collection size $n at offset $consumed")
      var i = 0L
      while (i < n) { item(); i += 1 }
    }
    def skip(n: Long): Unit = {
      require(n >= 0, s"bad skip $n")
      var left = n
      val junk = new Array[Byte](8192)
      while (left > 0) {
        val r = in.read(junk, 0, math.min(left, junk.length.toLong).toInt)
        if (r < 0) throw new EOFException(s"manifest truncated at $consumed")
        left -= r; consumed += r
        guard()
      }
    }
    private def readFully(dst: Array[Byte], n: Int): Unit = {
      var off = 0
      while (off < n) {
        val r = in.read(dst, off, n - off)
        if (r < 0) throw new EOFException(s"manifest truncated at $consumed")
        off += r; consumed += r
      }
      guard()
    }
    private def guard(): Unit =
      require(consumed <= MaxStreamSize, s"manifest stream exceeds 32 GiB (solana.rs:40)")
  }

  private final class Writer {
    private val bos = new ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def bool(v: Boolean): Unit = u8(if (v) 1 else 0)
    def u64(v: Long): Unit =
      bos.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array())
    def u128(v: Long): Unit = { u64(v); u64(0) }
    def f64(v: Double): Unit =
      bos.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array())
    def bytes(b: Array[Byte]): Unit = bos.write(b)
    def option(v: Option[() => Unit]): Unit = v match {
      case Some(writeValue) => bool(true); writeValue()
      case None             => bool(false)
    }
    def seq(n: Long)(items: => Unit): Unit = { u64(n); items }
    def result(): Array[Byte] = bos.toByteArray
  }
}
