package graft.etl.binary

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal ISO-BMFF (MP4/MOV) CONTAINER parser — JDK-only, zero codec jars.
  *
  * The JDK ships no video *pixel* codecs, but the MP4 container itself is a
  * plain length-prefixed box tree (ISO/IEC 14496-12, publicly specified), so
  * the *metadata* a training pipeline actually filters and buckets on —
  * duration, dimensions, frame count, codec fourcc, track inventory — is
  * fully decodable with a few hundred lines of byte walking. This upgrades
  * the engine's video path from "seeded fake features" to REAL container
  * metadata; only the pixel decode itself remains stubbed (see
  * [[graft.operators.Multimodal.MediaDecoder]]).
  *
  * Robustness contract (untrusted bytes): bounded box count and recursion
  * depth, every read length-checked; truncated/foreign/hostile payloads
  * return None — never throw, never over-read.
  *
  * A deterministic minimal WRITER ([[build]]) lives alongside the parser so
  * specs and the e2e query can synthesize valid containers without codec
  * tooling (same fixture philosophy as
  * [[graft.sources.SnapshotFixture]]).
  */
object IsoBmff {

  /** Parsed container metadata. Durations are in milliseconds (converted
    * from the container's own timescale). */
  final case class Mp4Info(
      brand: String,
      durationMs: Long,
      width: Int,
      height: Int,
      videoTracks: Int,
      audioTracks: Int,
      /** sample (≈frame) count of the first video track's stsz, 0 if absent */
      frameCount: Long,
      /** sample-entry fourcc of the first video track ("avc1", …) */
      codec: String)

  private val MaxBoxes = 4096
  private val MaxDepth = 8
  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, StandardCharsets.US_ASCII)

  /** mutable per-parse accumulator (single-threaded walk) */
  private final class Acc {
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    var videoTracks = 0
    var audioTracks = 0
    var frameCount = 0L
    var codec = ""
    var sawMvhd = false
    var boxes = 0
    // per-trak state, reset at each trak; committed when the trak's hdlr
    // identifies the track type
    var trakHandler = ""
    var trakStsz = 0L
    var trakCodec = ""
  }

  /** Parse a container; None on anything that is not a well-formed MP4 with
    * a moov/mvhd (the signal a pipeline needs to route the payload to a
    * real decoder vs the dead-letter path). */
  def parse(bytes: Array[Byte]): Option[Mp4Info] = {
    if (bytes == null || bytes.length < 16) return None
    val acc = new Acc
    try {
      if (!walk(bytes, 0, bytes.length, 0, "", acc)) return None
      if (!acc.sawMvhd) return None
      val durMs =
        if (acc.timescale > 0) acc.duration * 1000L / acc.timescale else 0L
      Some(Mp4Info(acc.brand, durMs, acc.width, acc.height,
        acc.videoTracks, acc.audioTracks, acc.frameCount, acc.codec))
    } catch {
      // length checks make this unreachable, but untrusted bytes never throw
      case _: RuntimeException => None
    }
  }

  /** Walk boxes in [from, to); returns false on malformed structure. */
  private def walk(b: Array[Byte], from: Int, to: Int, depth: Int,
      parent: String, acc: Acc): Boolean = {
    if (depth > MaxDepth) return true // too deep: ignore, don't fail
    var pos = from
    while (pos + 8 <= to) {
      acc.boxes += 1
      if (acc.boxes > MaxBoxes) return true // bounded work on hostile input
      var size = u32(b, pos)
      val typ = fourcc(b, pos + 4)
      var hdr = 8
      if (size == 1) {
        if (pos + 16 > to) return false
        size = u64(b, pos + 8)
        hdr = 16
      } else if (size == 0) size = (to - pos).toLong // box extends to end
      if (size < hdr || pos + size > to) return false
      val body = pos + hdr
      val bodyEnd = (pos + size).toInt
      typ match {
        case "ftyp" if body + 4 <= bodyEnd =>
          acc.brand = fourcc(b, body)
        case "mvhd" => parseMvhd(b, body, bodyEnd, acc)
        case "tkhd" => parseTkhd(b, body, bodyEnd, acc)
        case "hdlr" if parent == "mdia" && body + 12 <= bodyEnd =>
          acc.trakHandler = fourcc(b, body + 8)
        case "stsd" if body + 16 <= bodyEnd =>
          // fullbox(4) + entry_count(4), then first sample entry: size+fourcc
          acc.trakCodec = fourcc(b, body + 12)
        case "stsz" if body + 12 <= bodyEnd =>
          acc.trakStsz = u32(b, body + 8) // sample_count (after sample_size)
        case "trak" =>
          acc.trakHandler = ""; acc.trakStsz = 0L; acc.trakCodec = ""
          if (!walk(b, body, bodyEnd, depth + 1, typ, acc)) return false
          // commit the finished trak to the track inventory
          acc.trakHandler match {
            case "vide" =>
              acc.videoTracks += 1
              if (acc.frameCount == 0L) acc.frameCount = acc.trakStsz
              if (acc.codec.isEmpty) acc.codec = acc.trakCodec
            case "soun" => acc.audioTracks += 1
            case _ => ()
          }
        case t if Containers.contains(t) =>
          if (!walk(b, body, bodyEnd, depth + 1, typ, acc)) return false
        case _ => () // mdat, free, skip unknown leaves wholesale
      }
      pos = bodyEnd
    }
    pos == to || pos >= to - 7 // trailing garbage < a box header is tolerated
  }

  private def parseMvhd(b: Array[Byte], body: Int, end: Int, acc: Acc): Unit = {
    if (body + 4 > end) return
    val version = b(body) & 0xff
    if (version == 1) {
      // v1: creation u64, modification u64, timescale u32, duration u64
      if (body + 4 + 8 + 8 + 4 + 8 > end) return
      acc.timescale = u32(b, body + 20)
      acc.duration = u64(b, body + 24)
    } else {
      // v0: creation u32, modification u32, timescale u32, duration u32
      if (body + 4 + 4 + 4 + 4 + 4 > end) return
      acc.timescale = u32(b, body + 12)
      acc.duration = u32(b, body + 16)
    }
    acc.sawMvhd = true
  }

  private def parseTkhd(b: Array[Byte], body: Int, end: Int, acc: Acc): Unit = {
    if (body + 4 > end) return
    val version = b(body) & 0xff
    // offset of width relative to body: fullbox(4) + {v0: 5×u32 | v1:
    // u64,u64,u32,u32,u64} + reserved(8) + layer(2) + alt_group(2) +
    // volume(2) + reserved(2) + matrix(36)
    val widthOff = if (version == 1) 4 + 32 + 8 + 2 + 2 + 2 + 2 + 36
                   else 4 + 20 + 8 + 2 + 2 + 2 + 2 + 36
    if (body + widthOff + 8 > end) return
    // 16.16 fixed point; keep the max across tracks (poster/thumbnail
    // tracks carry 0×0)
    val w = (u32(b, body + widthOff) >> 16).toInt
    val h = (u32(b, body + widthOff + 4) >> 16).toInt
    if (w > acc.width) acc.width = w
    if (h > acc.height) acc.height = h
  }

  // ------------------------------------------------------------------
  // deterministic minimal writer (fixtures / e2e query)
  // ------------------------------------------------------------------

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val total = 8 + payload.map(_.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(total)
    buf.put(typ.getBytes(StandardCharsets.US_ASCII))
    payload.foreach(buf.put)
    buf.array()
  }

  private def be32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt((v & 0xffffffffL).toInt).array()
  private def be16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).putShort(v.toShort).array()

  /** Build a minimal valid MP4: ftyp + moov(mvhd, video trak, optional
    * audio trak) + mdat carrying `payload`. All fields deterministic — same
    * inputs, same bytes. `durationMs` uses a 1000-unit timescale. */
  def build(width: Int, height: Int, durationMs: Long, frameCount: Long,
      codec: String = "avc1", withAudio: Boolean = false,
      payload: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(codec.length == 4, s"codec fourcc must be 4 chars: '$codec'")
    val ftyp = box("ftyp",
      "isom".getBytes(StandardCharsets.US_ASCII), be32(512),
      "isomiso2".getBytes(StandardCharsets.US_ASCII))
    val mvhd = box("mvhd",
      be32(0), // version 0 + flags
      be32(0), be32(0), // creation, modification (fixed: determinism)
      be32(1000), // timescale: 1 unit = 1 ms
      be32(durationMs), // duration
      be32(0x00010000), be16(0x0100), be16(0), // rate, volume, reserved
      new Array[Byte](8), // reserved
      identityMatrix, be32(0), be32(0), be32(0), be32(0), be32(0), be32(0),
      be32(2)) // next_track_ID
    def tkhd(trackId: Int, w: Int, h: Int) = box("tkhd",
      be32(7), // version 0, flags: enabled|in_movie|in_preview
      be32(0), be32(0), be32(trackId), be32(0), be32(durationMs),
      new Array[Byte](8), be16(0), be16(0), be16(0), be16(0),
      identityMatrix,
      be32(w.toLong << 16), be32(h.toLong << 16))
    def hdlr(handler: String, name: String) = box("hdlr",
      be32(0), be32(0), handler.getBytes(StandardCharsets.US_ASCII),
      new Array[Byte](12), (name + " ").getBytes(StandardCharsets.US_ASCII))
    def stsz(n: Long) = box("stsz", be32(0), be32(0), be32(n))
    def stsd(fourcc: String) = box("stsd", be32(0), be32(1),
      box(fourcc, new Array[Byte](8))) // minimal opaque sample entry
    def stbl(fourcc: String, n: Long) = box("stbl", stsd(fourcc), stsz(n))
    def minf(fourcc: String, n: Long) = box("minf", stbl(fourcc, n))
    def mdia(handler: String, name: String, fourcc: String, n: Long) =
      box("mdia", hdlr(handler, name), minf(fourcc, n))
    val vtrak = box("trak", tkhd(1, width, height),
      mdia("vide", "VideoHandler", codec, frameCount))
    val atrak =
      if (withAudio)
        Seq(box("trak", tkhd(2, 0, 0), mdia("soun", "SoundHandler", "mp4a", 0)))
      else Seq.empty
    val moov = box("moov", (Seq(mvhd, vtrak) ++ atrak): _*)
    val mdat = box("mdat", payload)
    ftyp ++ moov ++ mdat
  }

  private def identityMatrix: Array[Byte] = {
    val m = ByteBuffer.allocate(36)
    m.putInt(0x00010000); m.putInt(0); m.putInt(0)
    m.putInt(0); m.putInt(0x00010000); m.putInt(0)
    m.putInt(0); m.putInt(0); m.putInt(0x40000000)
    m.array()
  }
}
