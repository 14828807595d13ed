package graft.etl.binary

import java.nio.{ByteBuffer, ByteOrder}

import graft.etl.model.{TokenAccount, TokenMint, TokenMultisig}

/** SPL Token program account unpackers.
  *
  * Fixed-offset little-endian layouts as decoded by the reference's SQLite
  * enrichment path (/root/reference/src/bin/solana-snapshot-etl/sqlite.rs:
  * 235-324): token account = 165 B, mint = 82 B, multisig = 355 B; any other
  * size under the token program owner is warn-and-skip (sqlite.rs:252-258).
  * `COption<T>` = 4-byte little-endian tag (0/1) + value bytes.
  *
  * Uninitialized accounts are REJECTED (→ None), mirroring spl_token's
  * `Pack::unpack` (the reference's `if let Ok(..)` at sqlite.rs:238-251
  * skips them): a token account whose `state` is 0 (Uninitialized), a mint
  * with `is_initialized == false`, or a multisig with
  * `is_initialized == 0` never reaches a sink row.
  */
object SplToken {

  /** spl_token program id (base58 "TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA"),
    * dispatch key F6 (sqlite.rs:208). */
  val ProgramId: Array[Byte] = Base58.decode("TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA")

  final val TokenAccountSize = 165
  final val MintSize = 82
  final val MultisigSize = 355
  final val MaxSigners = 11

  private def le(bytes: Array[Byte]) = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  private def slice(b: Array[Byte], off: Int, len: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(b, off, off + len)

  /** COption<Pubkey>: 4-B tag + 32-B value (36 B total). */
  private def cOptionPubkey(b: Array[Byte], off: Int): Option[Array[Byte]] =
    if (le(b).getInt(off) == 1) Some(slice(b, off + 4, 32)) else None

  /** COption<u64>: 4-B tag + 8-B value (12 B total). */
  private def cOptionU64(b: Array[Byte], off: Int): Option[Long] =
    if (le(b).getInt(off) == 1) Some(le(b).getLong(off + 4)) else None

  /** 165-B token account (sqlite.rs:264-284): mint(0,32) owner(32,32)
    * amount(64,u64) delegate(72,COption pk) state(108,u8)
    * is_native(109,COption u64) delegated_amount(121,u64)
    * close_authority(129,COption pk). `state == 0` (Uninitialized) rejects
    * the account, as spl_token's `Account::unpack` does. */
  def unpackTokenAccount(data: Array[Byte]): Option[TokenAccount] = {
    if (data.length != TokenAccountSize) return None
    if (data(108) == 0) return None // AccountState::Uninitialized
    val buf = le(data)
    Some(TokenAccount(
      mint = slice(data, 0, 32),
      owner = slice(data, 32, 32),
      amount = buf.getLong(64),
      delegate = cOptionPubkey(data, 72),
      state = (data(108) & 0xff).toShort,
      isNative = cOptionU64(data, 109),
      delegatedAmount = buf.getLong(121),
      closeAuthority = cOptionPubkey(data, 129)))
  }

  /** 82-B mint (sqlite.rs:286-303): mint_authority(0,COption pk)
    * supply(36,u64) decimals(44,u8) is_initialized(45,u8)
    * freeze_authority(46,COption pk). `is_initialized == false` rejects the
    * mint, as spl_token's `Mint::unpack` does. */
  def unpackMint(data: Array[Byte]): Option[TokenMint] = {
    if (data.length != MintSize) return None
    if (data(45) == 0) return None // uninitialized
    val buf = le(data)
    Some(TokenMint(
      mintAuthority = cOptionPubkey(data, 0),
      supply = buf.getLong(36),
      decimals = (data(44) & 0xff).toShort,
      isInitialized = data(45) != 0,
      freezeAuthority = cOptionPubkey(data, 46)))
  }

  /** 355-B multisig (sqlite.rs:305-315): m(0,u8) n(1,u8)
    * is_initialized(2,u8) signers(3, 11×32 B). Only the first `n` signer
    * slots are meaningful (explode G1, sqlite.rs:315-322).
    * `is_initialized == 0` rejects, as spl_token's `Multisig::unpack` does. */
  def unpackMultisig(data: Array[Byte]): Option[TokenMultisig] = {
    if (data.length != MultisigSize) return None
    if (data(2) == 0) return None // uninitialized
    val m = (data(0) & 0xff).toShort
    val n = (data(1) & 0xff).toShort
    val signers = (0 until math.min(n.toInt, MaxSigners))
      .map(i => slice(data, 3 + i * 32, 32))
    Some(TokenMultisig(m, n, signers))
  }

  // --- fixture encoders (round-trip tests; reference ships no fixtures) ---

  def packTokenAccount(t: TokenAccount): Array[Byte] = {
    val b = ByteBuffer.allocate(TokenAccountSize).order(ByteOrder.LITTLE_ENDIAN)
    b.position(0); b.put(t.mint); b.put(t.owner); b.putLong(t.amount)
    putCOptPk(b, t.delegate)
    b.put(t.state.toByte)
    t.isNative match {
      case Some(v) => b.putInt(1); b.putLong(v)
      case None    => b.putInt(0); b.putLong(0L)
    }
    b.putLong(t.delegatedAmount)
    putCOptPk(b, t.closeAuthority)
    b.array()
  }

  def packMint(m: TokenMint): Array[Byte] = {
    val b = ByteBuffer.allocate(MintSize).order(ByteOrder.LITTLE_ENDIAN)
    putCOptPk(b, m.mintAuthority)
    b.putLong(m.supply); b.put(m.decimals.toByte)
    b.put(if (m.isInitialized) 1.toByte else 0.toByte)
    putCOptPk(b, m.freezeAuthority)
    b.array()
  }

  def packMultisig(ms: TokenMultisig): Array[Byte] = {
    val b = ByteBuffer.allocate(MultisigSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put(ms.m.toByte); b.put(ms.n.toByte); b.put(1.toByte)
    ms.signers.take(MaxSigners).foreach(b.put)
    b.array()
  }

  private def putCOptPk(b: ByteBuffer, v: Option[Array[Byte]]): Unit = v match {
    case Some(pk) => b.putInt(1); b.put(pk)
    case None     => b.putInt(0); b.put(new Array[Byte](32))
  }
}
