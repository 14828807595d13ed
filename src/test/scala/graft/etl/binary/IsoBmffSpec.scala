package graft.etl.binary

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF container parser: writer round-trip plus HAND-AUTHORED boxes
  * for the shapes the deterministic writer never emits (version-1 mvhd/tkhd,
  * 64-bit box sizes, size-0 to-end boxes, hostile inputs). The parser must
  * never throw and never over-read — training-data payload columns are
  * untrusted bytes. */
class IsoBmffSpec extends AnyFunSuite {

  private def be32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt((v & 0xffffffffL).toInt).array()
  private def be64(v: Long): Array[Byte] = ByteBuffer.allocate(8).putLong(v).array()
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val total = 8 + payload.map(_.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(total).put(typ.getBytes(StandardCharsets.US_ASCII))
    payload.foreach(buf.put)
    buf.array()
  }

  test("writer round-trip: every field the writer sets comes back") {
    val bytes = IsoBmff.build(width = 1920, height = 1080, durationMs = 90000,
      frameCount = 2160, codec = "hvc1", withAudio = true,
      payload = Array.tabulate[Byte](100)(_.toByte))
    val info = IsoBmff.parse(bytes).get
    assert(info.brand === "isom")
    assert(info.durationMs === 90000L)
    assert(info.width === 1920 && info.height === 1080)
    assert(info.videoTracks === 1 && info.audioTracks === 1)
    assert(info.frameCount === 2160L)
    assert(info.codec === "hvc1")
  }

  test("writer determinism: same inputs, same bytes") {
    val a = IsoBmff.build(640, 480, 1000, 30)
    val b = IsoBmff.build(640, 480, 1000, 30)
    assert(a.toSeq === b.toSeq)
  }

  test("version-1 mvhd (64-bit duration) parses — hand-authored") {
    // fullbox v1: ver(1)+flags(3), creation u64, modification u64,
    // timescale u32, duration u64
    val mvhdV1 = box("mvhd",
      Array[Byte](1, 0, 0, 0), be64(0), be64(0), be32(90000), be64(9000000L))
    val bytes = box("ftyp", "mp42".getBytes(StandardCharsets.US_ASCII)) ++
      box("moov", mvhdV1)
    val info = IsoBmff.parse(bytes).get
    assert(info.brand === "mp42")
    assert(info.durationMs === 9000000L * 1000 / 90000) // 100000 ms
  }

  test("version-1 tkhd (64-bit times) yields width/height — hand-authored") {
    val tkhdV1 = box("tkhd",
      Array[Byte](1, 0, 0, 7), be64(0), be64(0), be32(1), be32(0), be64(500),
      new Array[Byte](8), new Array[Byte](8), // reserved + layer/alt/vol/resv
      new Array[Byte](36), // matrix (content ignored by the parser)
      be32(1280L << 16), be32(720L << 16))
    val hdlr = box("hdlr", be32(0), be32(0),
      "vide".getBytes(StandardCharsets.US_ASCII), new Array[Byte](12))
    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(1000), be32(500))
    val bytes = box("moov", mvhd, box("trak", tkhdV1, box("mdia", hdlr)))
    val info = IsoBmff.parse(bytes).get
    assert(info.width === 1280 && info.height === 720)
    assert(info.videoTracks === 1)
  }

  test("64-bit (size==1) and to-end (size==0) boxes walk correctly") {
    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(1000), be32(2000))
    val moov = box("moov", mvhd)
    // re-wrap moov as a size==1 largesize box
    val large = ByteBuffer.allocate(16 + moov.length - 8)
      .putInt(1).put("moov".getBytes(StandardCharsets.US_ASCII))
      .putLong(16L + moov.length - 8).put(moov.drop(8)).array()
    // trailing size==0 mdat extends to end of input
    val mdat0 = ByteBuffer.allocate(8 + 5)
      .putInt(0).put("mdat".getBytes(StandardCharsets.US_ASCII))
      .put(Array.tabulate[Byte](5)(_.toByte)).array()
    val info = IsoBmff.parse(large ++ mdat0).get
    assert(info.durationMs === 2000L)
  }

  test("hostile inputs return None, never throw") {
    val good = IsoBmff.build(320, 240, 1000, 24)
    val cases = Seq[Array[Byte]](
      null,
      Array.emptyByteArray,
      Array.tabulate[Byte](1000)(i => (i * 37).toByte), // noise
      good.take(12),                                    // header only
      good.take(good.length / 2),                       // cut inside moov
      be32(0xffffffffL) ++ "moov".getBytes(StandardCharsets.US_ASCII), // size lies
      box("moov", box("mvhd", be32(0))),                // mvhd too short: no fields
      // deep self-nesting (box claims to be its own child repeatedly)
      (0 until 200).foldLeft(box("mvhd", be32(0), be32(0), be32(0), be32(1), be32(1))) {
        (inner, _) => box("moov", inner)
      })
    cases.foreach { c =>
      val r = IsoBmff.parse(c)
      // mvhd-too-short and over-deep nesting parse the structure but find no
      // usable mvhd → None; all others are malformed → None
      assert(r.isEmpty, s"expected None for ${if (c == null) "null" else s"${c.length}B"}")
    }
  }

  test("payload survives in mdat and does not confuse the walk") {
    // payload bytes that themselves look like box headers
    val evil = box("moov", box("mvhd", be32(0), be32(0), be32(0), be32(1), be32(1)))
    val bytes = IsoBmff.build(100, 100, 1000, 10, payload = evil)
    val info = IsoBmff.parse(bytes).get
    assert(info.width === 100 && info.durationMs === 1000L)
    assert(info.videoTracks === 1) // the mdat-embedded moov was not walked
  }
}
