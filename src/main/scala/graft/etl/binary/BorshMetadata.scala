package graft.etl.binary

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.etl.model.{Creator, TokenMetadata}

/** Metaplex token-metadata borsh decoder with EOF-tolerant progressive tail.
  *
  * Mirrors the reference's decode chain (/root/reference/src/mpl_metadata.rs:
  * 6-84 driven from sqlite.rs:326-360): a 1-byte account-key tag must be
  * `MetadataV1` (=4); the v1 body must parse or it is an error; the v1.1
  * (`edition_nonce`) tail and the v1.2 (`token_standard` + `collection` +
  * `uses`, ALL-or-nothing) tail are each optional — truncation at any tail boundary yields nulls, not an
  * error (`deserialize(...).ok()` chaining, sqlite.rs:344-347). This is the
  * engine's schema-evolution showcase: new nullable columns, no rewrite.
  *
  * Borsh primitives: little-endian ints; String = u32 length + UTF-8 bytes;
  * Option<T> = u8 tag (0/1) + value; Vec<T> = u32 count + items.
  */
object BorshMetadata {

  /** mpl metadata program id ("metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s"),
    * dispatch key F7 (sqlite.rs:211, mpl_metadata.rs:4). */
  val ProgramId: Array[Byte] = Base58.decode("metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s")

  final val KeyMetadataV1: Byte = 4

  sealed trait DecodeResult
  final case class Decoded(meta: TokenMetadata) extends DecodeResult
  /** Guard skips (F11): empty data / wrong key byte → skip row silently. */
  case object Skip extends DecodeResult
  /** Bad v1 body under a MetadataV1 key → error (sqlite.rs:337-342). */
  final case class Malformed(msg: String) extends DecodeResult

  def decode(data: Array[Byte]): DecodeResult = {
    if (data.isEmpty) return Skip
    if (data(0) != KeyMetadataV1) return Skip
    val in = new Reader(data, 1)
    val v1 =
      try {
        val updateAuthority = in.bytes(32)
        val mint = in.bytes(32)
        val name = in.string()
        val symbol = in.string()
        val uri = in.string()
        val sellerFee = in.u16()
        val creators = in.option(() => in.vec(() =>
          Creator(in.bytes(32), in.bool(), (in.u8() & 0xff).toShort)))
        val primarySale = in.bool()
        val isMutable = in.bool()
        TokenMetadata(updateAuthority, mint, name, symbol, uri, sellerFee,
          creators, primarySale, isMutable, None, None, None, None, None, None, None)
      } catch {
        case e: IndexOutOfBoundsException => return Malformed(s"bad Metadata body: ${e.getMessage}")
        case e: IllegalArgumentException  => return Malformed(s"bad Metadata body: ${e.getMessage}")
      }
    // v1.1 tail: Option<edition_nonce u8> — EOF ⇒ stop, keep v1.
    val v11 =
      try v1.copy(editionNonce = in.option(() => (in.u8() & 0xff).toShort))
      catch { case _: IndexOutOfBoundsException => return Decoded(v1) }
    // v1.2 tail: Option<token_standard u8>, Option<Collection{verified,key}>,
    // Option<Uses{use_method u8, remaining u64, total u64}> — ALL-or-nothing:
    // the reference deserializes the whole MetadataExtV1_2 struct and .ok()s
    // it (sqlite.rs:344-347, mpl_metadata.rs:33-38), so truncation anywhere
    // inside it (including mid-`uses`) rolls the entire tail back to v1.1.
    val v12 =
      try {
        val std = in.option(() => (in.u8() & 0xff).toShort)
        val coll = in.option(() => (in.bool(), in.bytes(32)))
        val uses = in.option(() => ((in.u8() & 0xff).toShort, in.u64(), in.u64()))
        v11.copy(tokenStandard = std,
          collectionVerified = coll.map(_._1),
          collectionKey = coll.map(_._2),
          useMethod = uses.map(_._1),
          usesRemaining = uses.map(_._2),
          usesTotal = uses.map(_._3))
      } catch { case _: IndexOutOfBoundsException => return Decoded(v11) }
    Decoded(v12)
  }

  private final class Reader(data: Array[Byte], var pos: Int) {
    private val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    private def need(n: Int): Unit =
      if (pos + n > data.length) throw new IndexOutOfBoundsException(s"need $n at $pos/${data.length}")
    def u8(): Byte = { need(1); val v = data(pos); pos += 1; v }
    def bool(): Boolean = u8() != 0
    def u16(): Int = { need(2); val v = buf.getShort(pos) & 0xffff; pos += 2; v }
    def u32(): Int = { need(4); val v = buf.getInt(pos); pos += 4; v }
    def u64(): Long = { need(8); val v = buf.getLong(pos); pos += 8; v }
    def bytes(n: Int): Array[Byte] = {
      need(n); val v = java.util.Arrays.copyOfRange(data, pos, pos + n); pos += n; v
    }
    def string(): String = {
      val len = u32()
      require(len >= 0 && len <= data.length, s"bad string len $len")
      new String(bytes(len), "UTF-8") // NUL padding preserved verbatim (§7.5)
    }
    def option[T](read: () => T): Option[T] = if (bool()) Some(read()) else None
    def vec[T](read: () => T): Seq[T] = {
      val n = u32()
      require(n >= 0 && n <= data.length, s"bad vec len $n")
      (0 until n).map(_ => read())
    }
  }

  // --- fixture encoder (truncatable at version boundaries for tests) ---

  /** Encode at a given schema version: 1 → v1 only, 2 → +edition_nonce,
    * 3 → +token_standard/collection. */
  def encode(m: TokenMetadata, version: Int = 3): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def putU32(v: Int): Unit =
      bos.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    def putStr(s: String): Unit = { val b = s.getBytes("UTF-8"); putU32(b.length); bos.write(b) }
    def putBool(b: Boolean): Unit = bos.write(if (b) 1 else 0)
    bos.write(KeyMetadataV1.toInt)
    bos.write(m.updateAuthority); bos.write(m.mint)
    putStr(m.name); putStr(m.symbol); putStr(m.uri)
    bos.write(ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(m.sellerFeeBasisPoints.toShort).array())
    m.creators match {
      case Some(cs) =>
        putBool(true); putU32(cs.size)
        cs.foreach { c => bos.write(c.address); putBool(c.verified); bos.write(c.share.toInt) }
      case None => putBool(false)
    }
    putBool(m.primarySaleHappened); putBool(m.isMutable)
    if (version >= 2) {
      m.editionNonce match {
        case Some(n) => putBool(true); bos.write(n.toInt)
        case None    => putBool(false)
      }
    }
    if (version >= 3) {
      m.tokenStandard match {
        case Some(s) => putBool(true); bos.write(s.toInt)
        case None    => putBool(false)
      }
      (m.collectionVerified, m.collectionKey) match {
        case (Some(v), Some(k)) => putBool(true); putBool(v); bos.write(k)
        case _                  => putBool(false)
      }
      // uses (mpl_metadata.rs:75-78): part of the same all-or-nothing struct
      (m.useMethod, m.usesRemaining, m.usesTotal) match {
        case (Some(um), Some(rem), Some(tot)) =>
          putBool(true); bos.write(um.toInt)
          bos.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(rem).array())
          bos.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(tot).array())
        case _ => putBool(false)
      }
    }
    bos.toByteArray
  }
}
