package graft.etl.model

/** Core typed rows of the engine (SURVEY.md §1.3).
  *
  * `AccountUpdate` is the unit of change flowing through the CDC pipeline:
  * one decoded record from an AppendVec (reference layout:
  * /root/reference/src/append_vec.rs:53-107). All u64 fields from the
  * reference are carried as `Long` with wrap semantics — the reference
  * itself casts u64→i64 for its SQLite sink (sqlite.rs:226-230).
  */
final case class AccountUpdate(
    pubkey: Array[Byte],   // 32 B key            — append_vec.rs:58
    slot: Long,            // from filename        — lib.rs:48-57
    writeVersion: Long,    //                      — append_vec.rs:56
    dataLen: Long,         //                      — append_vec.rs:59
    owner: Array[Byte],    // 32 B dispatch key    — append_vec.rs:69
    lamports: Long,        //                      — append_vec.rs:67
    executable: Boolean,   //                      — append_vec.rs:71
    rentEpoch: Long,       //                      — append_vec.rs:73
    hash: Array[Byte],     // 32 B                 — append_vec.rs:106
    data: Array[Byte])     // opaque payload       — append_vec.rs:103

/** Reference to one AppendVec storage file, joined with the manifest's
  * `accounts_current_len` (J1, archived.rs:116-126). */
final case class AppendVecRef(path: String, slot: Long, id: Long, currentLen: Long)

/** One manifest entry: slot → (appendvec id, valid byte length)
  * (solana.rs:100-111). */
final case class ManifestEntry(slot: Long, id: Long, currentLen: Long)

/** Parsed snapshot manifest (the prefix of the bank fields we keep +
  * AccountsDbFields; solana.rs:63-111). */
final case class SnapshotManifest(
    slot: Long,
    writeVersion: Long,
    isDelta: Boolean,
    bankHash: Array[Byte],
    entries: Seq[ManifestEntry]) {
  /** (slot, id) → accounts_current_len lookup used by the manifest join. */
  def lengthMap: Map[(Long, Long), Long] =
    entries.map(e => (e.slot, e.id) -> e.currentLen).toMap
}

/** SPL token-account decode result (sqlite.rs:264-284; 165-byte layout). */
final case class TokenAccount(
    mint: Array[Byte],
    owner: Array[Byte],
    amount: Long,
    delegate: Option[Array[Byte]],
    state: Short,
    isNative: Option[Long],
    delegatedAmount: Long,
    closeAuthority: Option[Array[Byte]])

/** SPL mint decode result (sqlite.rs:286-303; 82-byte layout). */
final case class TokenMint(
    mintAuthority: Option[Array[Byte]],
    supply: Long,
    decimals: Short,
    isInitialized: Boolean,
    freezeAuthority: Option[Array[Byte]])

/** SPL multisig decode result (sqlite.rs:305-315; 355-byte layout). */
final case class TokenMultisig(m: Short, n: Short, signers: Seq[Array[Byte]])

/** Metaplex token metadata, progressively decoded (mpl_metadata.rs:6-84).
  * v1.1/v1.2 tails are nullable — the schema-evolution showcase. */
final case class TokenMetadata(
    updateAuthority: Array[Byte],
    mint: Array[Byte],
    name: String,
    symbol: String,
    uri: String,
    sellerFeeBasisPoints: Int,
    creators: Option[Seq[Creator]],
    primarySaleHappened: Boolean,
    isMutable: Boolean,
    // v1.1 tail (nullable)
    editionNonce: Option[Short],
    // v1.2 tail (nullable) — token_standard, collection AND uses parse
    // all-or-nothing (mpl_metadata.rs:33-38, sqlite.rs:344-347)
    tokenStandard: Option[Short],
    collectionVerified: Option[Boolean],
    collectionKey: Option[Array[Byte]],
    // Uses { use_method u8, remaining u64, total u64 } (mpl_metadata.rs:75-78)
    useMethod: Option[Short],
    usesRemaining: Option[Long],
    usesTotal: Option[Long])

final case class Creator(address: Array[Byte], verified: Boolean, share: Short)

/** Generic CDC change event over the north-rule input table
  * (BASELINE.json input_hint): an Iceberg-style table of source-code
  * repositories. `(repo, path)` ≙ pubkey, `commitSeq` ≙ write_version,
  * `lang` ≙ owner. */
final case class RepoFileChange(
    repo: String,
    path: String,
    commit: String,
    commitSeq: Long,
    lang: String,
    content: String)
