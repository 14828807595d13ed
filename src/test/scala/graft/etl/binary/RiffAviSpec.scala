package graft.etl.binary

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** RIFF/AVI container codec: writer→parser round trip, MJPEG frames decode
  * through ImageIO, hostile-byte robustness. */
class RiffAviSpec extends AnyFunSuite {

  /** one solid-gray JPEG frame at the given luma */
  private def jpegFrame(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("writer -> parser round trip preserves header and frame slices") {
    val frames = Seq(40, 200, 40, 200, 40, 200).map(jpegFrame(32, 24, _))
    val avi = RiffAvi.build(frames, width = 32, height = 24, fps = 10)
    val info = RiffAvi.parse(avi).get
    assert(info.width === 32 && info.height === 24)
    assert(info.totalFrames === 6 && info.frameSlices.size === 6)
    assert(info.streams === 1 && info.videoHandler === "MJPG")
    assert(info.microSecPerFrame === 100000L && info.fps === 10.0)
    assert(info.durationMs === 600L)
    // each slice is byte-identical to the JPEG that went in
    info.frameSlices.zip(frames).foreach { case (s, orig) =>
      assert(RiffAvi.frame(avi, s).toSeq === orig.toSeq)
    }
  }

  test("every extracted frame decodes through ImageIO with the right pixels") {
    val frames = Seq(30, 220).map(jpegFrame(16, 16, _))
    val avi = RiffAvi.build(frames, 16, 16)
    val info = RiffAvi.parse(avi).get
    val decoded = info.frameSlices.map(s =>
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(RiffAvi.frame(avi, s))))
    assert(decoded.forall(img => img != null && img.getWidth === 16 && img.getHeight === 16))
    // JPEG is lossy; solid-gray frames stay within a few levels of the input
    def centerGray(img: BufferedImage) = img.getRGB(8, 8) & 0xff
    assert(math.abs(centerGray(decoded(0)) - 30) <= 8)
    assert(math.abs(centerGray(decoded(1)) - 220) <= 8)
  }

  test("AVI-1.0 'rec ' interleave groups: frames inside nested movi lists " +
      "are collected") {
    val frames = Seq(60, 180, 90).map(jpegFrame(16, 16, _))
    val avi = RiffAvi.build(frames, 16, 16, recGroups = true)
    val info = RiffAvi.parse(avi).get
    assert(info.frameSlices.size === 3)
    info.frameSlices.zip(frames).foreach { case (s, orig) =>
      assert(RiffAvi.frame(avi, s).toSeq === orig.toSeq)
    }
  }

  test("odd-length frames keep word alignment (parser sees all frames)") {
    // raw byte frames of odd sizes exercise the RIFF pad byte on both sides
    val odd = Seq(Array[Byte](1), Array[Byte](2, 3, 4), Array[Byte](5, 6, 7, 8, 9))
    val avi = RiffAvi.build(odd, 8, 8)
    val info = RiffAvi.parse(avi).get
    assert(info.frameSlices.size === 3)
    assert(info.frameSlices.zip(odd).forall { case (s, o) =>
      RiffAvi.frame(avi, s).toSeq == o.toSeq })
  }

  test("fuzz: parse never throws — random bytes, truncations, and single-byte " +
      "mutations of a valid AVI all return None or a well-formed result") {
    val rnd = new java.util.Random(0xC0FFEE)
    // pure random payloads
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(512))
      rnd.nextBytes(b)
      RiffAvi.parse(b) // must not throw
    }
    val good = RiffAvi.build(Seq(jpegFrame(8, 8, 100), jpegFrame(8, 8, 200)), 8, 8)
    // every truncation point of a valid file
    (0 until good.length by 7).foreach { n =>
      RiffAvi.parse(good.take(n)) // must not throw
    }
    // single-byte mutations; when a parse still succeeds, its frame slices
    // must stay in bounds (the robustness contract: never over-read)
    (0 until 300).foreach { _ =>
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      RiffAvi.parse(m).foreach { info =>
        info.frameSlices.foreach { case (off, len) =>
          assert(off >= 0 && len >= 0 && off + len <= m.length)
        }
      }
    }
  }

  test("hostile bytes: truncated, foreign, and non-video payloads -> None") {
    val good = RiffAvi.build(Seq(jpegFrame(8, 8, 100)), 8, 8)
    assert(RiffAvi.parse(null) === None)
    assert(RiffAvi.parse(Array.empty[Byte]) === None)
    assert(RiffAvi.parse(Array.tabulate[Byte](64)(_.toByte)) === None)
    assert(RiffAvi.parse(good.take(20)) === None) // cut inside hdrl
    assert(RiffAvi.parse(IsoBmff.build(32, 24, 1000, 8)) === None) // an MP4
    // declared chunk size pointing past the buffer must not over-read
    val lying = good.clone()
    lying(4) = 0x7f.toByte; lying(5) = 0x7f.toByte // inflate RIFF size: ok (clamped)
    assert(RiffAvi.parse(lying).isDefined)
    val lyingChunk = good.clone()
    // inflate the avih chunk size so it runs past its list
    val avihAt = {
      var i = 0
      while (!(lyingChunk(i) == 'a' && lyingChunk(i + 1) == 'v' &&
        lyingChunk(i + 2) == 'i' && lyingChunk(i + 3) == 'h')) i += 1
      i
    }
    lyingChunk(avihAt + 4) = 0xff.toByte; lyingChunk(avihAt + 5) = 0xff.toByte
    assert(RiffAvi.parse(lyingChunk) === None)
  }
}
