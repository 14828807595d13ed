package graft.etl.binary

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal RIFF/AVI CONTAINER parser + writer — JDK-only, zero codec jars.
  *
  * The one video codec this environment CAN really decode is Motion-JPEG:
  * an MJPEG AVI is a plain little-endian RIFF chunk tree (Microsoft AVI
  * RIFF form, publicly specified) whose `00dc` movi chunks each hold ONE
  * ordinary JPEG image — which `javax.imageio.ImageIO` decodes natively.
  * Parsing the container therefore upgrades the engine's video path from
  * "container metadata only" (ISO-BMFF, [[IsoBmff]]) to REAL per-frame
  * PIXEL decode for MJPEG payloads; only exotic inter-frame codecs (H.264
  * etc.) remain environment-stubbed.
  *
  * Robustness contract (untrusted bytes): bounded chunk count, every read
  * length-checked; truncated/foreign/hostile payloads return None — never
  * throw, never over-read.
  *
  * A deterministic minimal WRITER ([[build]]) lives alongside the parser so
  * specs can synthesize valid MJPEG AVIs without codec tooling (same
  * fixture philosophy as [[IsoBmff.build]]; the optional `idx1` index is
  * omitted — it duplicates information a sequential reader re-derives).
  */
object RiffAvi {

  /** Parsed container metadata + the lazy handle to the frames: byte
    * slices into the original payload, decoded only when a consumer asks
    * (a frame-SAMPLING stage must not decode the frames it skips). */
  final case class AviInfo(
      width: Int,
      height: Int,
      microSecPerFrame: Long,
      totalFrames: Long,
      streams: Int,
      /** fourcc of the first video stream's handler ("MJPG", …) */
      videoHandler: String,
      /** (offset, length) of each first-video-stream frame chunk payload */
      frameSlices: Vector[(Int, Int)]) {
    def durationMs: Long = microSecPerFrame * frameSlices.size / 1000L
    def fps: Double =
      if (microSecPerFrame > 0) 1e6 / microSecPerFrame else 0.0
  }

  private val MaxChunks = 65536

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, StandardCharsets.US_ASCII)

  /** Parse an AVI payload; None for anything that is not a well-formed
    * AVI with at least a header list (frames may be zero). */
  def parse(b: Array[Byte]): Option[AviInfo] = {
    if (b == null || b.length < 24) return None
    if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    val riffEnd = math.min(b.length.toLong, 8L + u32(b, 4)).toInt

    var width = 0; var height = 0
    var microSec = 0L; var totalFrames = 0L; var streams = 0
    var videoHandler = ""
    var sawAvih = false
    // stream ids are assigned in strl order; the FIRST 'vids' stream's
    // two-digit id prefixes its movi chunks ("00dc" for stream 0)
    var streamIdx = 0; var videoStreamId = -1
    val frames = Vector.newBuilder[(Int, Int)]
    var chunks = 0

    /** walk chunks in [from, until); `inMovi` collects video frame slices */
    def walk(from: Int, until: Int, inMovi: Boolean, inHdrl: Boolean): Boolean = {
      var off = from
      while (off + 8 <= until) {
        chunks += 1
        if (chunks > MaxChunks) return false
        val id = fourcc(b, off)
        val size = u32(b, off + 4)
        if (size > Int.MaxValue - 8 || off + 8 + size > until) return false
        val body = off + 8
        val end = body + size.toInt
        id match {
          case "LIST" =>
            if (size < 4) return false
            val listType = fourcc(b, body)
            // inMovi PROPAGATES into nested lists: AVI-1.0 interleaved files
            // group frames in `LIST rec ` chunks inside movi
            val ok = walk(body + 4, end, inMovi = inMovi || listType == "movi",
              inHdrl = inHdrl || listType == "hdrl" || listType == "strl")
            if (!ok) return false
          case "avih" if inHdrl =>
            if (size < 40) return false
            sawAvih = true
            microSec = u32(b, body)
            totalFrames = u32(b, body + 16)
            streams = u32(b, body + 24).toInt
            width = u32(b, body + 32).toInt
            height = u32(b, body + 36).toInt
          case "strh" if inHdrl =>
            if (size < 8) return false
            if (fourcc(b, body) == "vids" && videoStreamId < 0) {
              videoStreamId = streamIdx
              videoHandler = fourcc(b, body + 4)
            }
            streamIdx += 1
          case dc if inMovi && videoStreamId >= 0 && dc.length == 4 &&
              (dc.endsWith("dc") || dc.endsWith("db")) &&
              dc.take(2).forall(_.isDigit) &&
              dc.take(2).toInt == videoStreamId =>
            frames += ((body, size.toInt))
          case _ => // JUNK, idx1, audio chunks, INFO — skipped
        }
        off = end + (size.toInt & 1) // chunks are word-aligned
      }
      true
    }

    if (!walk(12, riffEnd, inMovi = false, inHdrl = false)) return None
    if (!sawAvih || width <= 0 || height <= 0) return None
    Some(AviInfo(width, height, microSec, totalFrames, streams,
      videoHandler, frames.result()))
  }

  /** Copy one frame's bytes out of the payload (a standalone JPEG for
    * MJPEG streams, ready for `ImageIO.read`). */
  def frame(b: Array[Byte], slice: (Int, Int)): Array[Byte] =
    java.util.Arrays.copyOfRange(b, slice._1, slice._1 + slice._2)

  // ------------------------------------------------------------- writer

  /** Deterministic minimal MJPEG-AVI writer: one video stream, each input
    * byte array one `00dc` frame (callers supply the JPEGs — e.g. ImageIO
    * output in specs). `recGroups` wraps each frame in an AVI-1.0
    * interleave `LIST rec ` group — the nested-list movi layout real muxers
    * emit, which the parser must see through. */
  def build(frames: Seq[Array[Byte]], width: Int, height: Int, fps: Int = 10,
      recGroups: Boolean = false): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val out = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes(StandardCharsets.US_ASCII)).putInt(body.length).put(body)
      out.array()
    }
    def list(listType: String, children: Seq[Array[Byte]]): Array[Byte] = {
      val bodyLen = 4 + children.map(_.length).sum
      val out = ByteBuffer.allocate(8 + bodyLen).order(ByteOrder.LITTLE_ENDIAN)
      out.put("LIST".getBytes(StandardCharsets.US_ASCII)).putInt(bodyLen)
        .put(listType.getBytes(StandardCharsets.US_ASCII))
      children.foreach(out.put)
      out.array()
    }
    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0)
      .putInt(frames.size) // dwTotalFrames
      .putInt(0)
      .putInt(1) // dwStreams
      .putInt(0)
      .putInt(width).putInt(height)
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes(StandardCharsets.US_ASCII))
      .put("MJPG".getBytes(StandardCharsets.US_ASCII))
      .putInt(0).putInt(0).putInt(0)
      .putInt(1) // dwScale
      .putInt(fps) // dwRate
      .putInt(0)
      .putInt(frames.size) // dwLength
      .putInt(0).putInt(0).putInt(0)
      .putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort) // rcFrame
    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40) // biSize
      .putInt(width).putInt(height)
      .putShort(1) // biPlanes
      .putShort(24) // biBitCount
      .put("MJPG".getBytes(StandardCharsets.US_ASCII)) // biCompression
      .putInt(width * height * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    val hdrl = list("hdrl", Seq(chunk("avih", avih.array()),
      list("strl", Seq(chunk("strh", strh.array()), chunk("strf", strf.array())))))
    val movi = list("movi",
      if (recGroups) frames.map(f => list("rec ", Seq(chunk("00dc", f))))
      else frames.map(chunk("00dc", _)))
    val bodyLen = 4 + hdrl.length + movi.length
    val out = ByteBuffer.allocate(8 + bodyLen).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(bodyLen)
      .put("AVI ".getBytes(StandardCharsets.US_ASCII))
      .put(hdrl).put(movi)
    out.array()
  }
}
