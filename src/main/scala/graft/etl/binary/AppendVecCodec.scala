package graft.etl.binary

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import graft.etl.model.AccountUpdate

/** AppendVec binary record codec.
  *
  * Byte-level spec: FIXTURES.md §1, derived from the reference's record scan
  * (/root/reference/src/append_vec.rs:251-268) — little-endian, every section
  * aligned up to the next 8-byte boundary (append_vec.rs:39-44), record
  * header 136 B, `stored_size = align8(136 + data_len)`.
  *
  * | offset | field         | type          |
  * |--------|---------------|---------------|
  * | 0      | write_version | u64           |
  * | 8      | pubkey        | [u8;32]       |
  * | 40     | data_len      | u64           |
  * | 48     | lamports      | u64           |
  * | 56     | rent_epoch    | u64           |
  * | 64     | owner         | [u8;32]       |
  * | 96     | executable    | u8 (+7 pad)   |
  * | 104    | hash          | [u8;32]       |
  * | 136    | data          | data_len (+pad to 8) |
  *
  * The scan stops at the first offset where a full record no longer fits
  * inside `currentLen` (append_vec.rs:221-224, lib.rs:61-70); `currentLen`
  * comes from the manifest, NOT the file size — trailing bytes are garbage
  * and must be ignored (archived.rs:127-130).
  */
object AppendVecCodec {

  final val HeaderSize = 136
  /** 16 GiB AppendVec size guard (append_vec.rs:46). */
  final val MaxAppendVecSize: Long = 16L * 1024 * 1024 * 1024

  @inline def align8(n: Long): Long = (n + 7L) & ~7L
  @inline def align8(n: Int): Int = (n + 7) & ~7

  /** Validate file-level invariants (append_vec.rs:138-160). */
  def validate(fileSize: Long, currentLen: Long): Unit = {
    require(fileSize > 0, s"AppendVec file is empty")
    require(fileSize <= MaxAppendVecSize, s"AppendVec too large: $fileSize")
    require(currentLen <= fileSize,
      s"manifest current_len $currentLen exceeds file size $fileSize")
  }

  /** Single-pass decode of all full records within `currentLen`.
    *
    * Returns a lazy iterator — callers inside `mapPartitions` stream rows out
    * without materializing the whole vec as rows (the buffer itself is one
    * allocation per file, mirroring the reference's one mmap per vec).
    */
  def decode(bytes: Array[Byte], slot: Long, currentLen: Long): Iterator[AccountUpdate] = {
    validate(bytes.length.toLong, currentLen)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[AccountUpdate] {
      private var offset = 0L
      private var nextRec: AccountUpdate = _
      private var done = false

      private def tryAdvance(): Unit = {
        if (done) return
        if (offset + HeaderSize > currentLen) { done = true; return }
        val base = offset.toInt
        val dataLen = buf.getLong(base + 40)
        if (dataLen < 0 || offset + HeaderSize + dataLen > currentLen) { done = true; return }
        val pubkey = new Array[Byte](32)
        val owner = new Array[Byte](32)
        val hash = new Array[Byte](32)
        val data = new Array[Byte](dataLen.toInt)
        getBytes(buf, base + 8, pubkey)
        getBytes(buf, base + 64, owner)
        getBytes(buf, base + 104, hash)
        getBytes(buf, base + 136, data)
        nextRec = AccountUpdate(
          pubkey = pubkey,
          slot = slot,
          writeVersion = buf.getLong(base),
          dataLen = dataLen,
          owner = owner,
          lamports = buf.getLong(base + 48),
          executable = buf.get(base + 96) != 0,
          rentEpoch = buf.getLong(base + 56),
          hash = hash,
          data = data)
        offset += align8(HeaderSize + dataLen)
      }

      tryAdvance()
      override def hasNext: Boolean = !done
      override def next(): AccountUpdate = {
        val r = nextRec; tryAdvance(); r
      }
    }
  }

  private def getBytes(buf: ByteBuffer, pos: Int, dst: Array[Byte]): Unit = {
    var i = 0
    while (i < dst.length) { dst(i) = buf.get(pos + i); i += 1 }
  }

  /** Encode records into AppendVec bytes (fixture generator — the reference
    * ships no fixtures, SURVEY.md §5). `trailingGarbage` bytes are appended
    * past the returned currentLen to exercise the ignore-tail rule.
    * Returns (bytes, currentLen). */
  def encode(records: Seq[AccountUpdate], trailingGarbage: Int = 0): (Array[Byte], Long) = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    records.foreach { r =>
      val rec = ByteBuffer.allocate(align8(HeaderSize + r.data.length))
        .order(ByteOrder.LITTLE_ENDIAN)
      rec.putLong(0, r.writeVersion)
      putBytes(rec, 8, r.pubkey, 32)
      rec.putLong(40, r.data.length.toLong)
      rec.putLong(48, r.lamports)
      rec.putLong(56, r.rentEpoch)
      putBytes(rec, 64, r.owner, 32)
      rec.put(96, if (r.executable) 1.toByte else 0.toByte)
      putBytes(rec, 104, r.hash, 32)
      putBytes(rec, 136, r.data, r.data.length)
      out.write(rec.array())
    }
    val currentLen = bos.size().toLong
    var i = 0
    while (i < trailingGarbage) { out.writeByte(0x5a); i += 1 }
    out.flush()
    (bos.toByteArray, currentLen)
  }

  private def putBytes(buf: ByteBuffer, pos: Int, src: Array[Byte], len: Int): Unit = {
    require(src.length == len, s"expected $len bytes, got ${src.length}")
    var i = 0
    while (i < len) { buf.put(pos + i, src(i)); i += 1 }
  }
}
