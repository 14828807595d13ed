package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkTestBase

/** Multimodal decode: the REAL JDK ImageIO path for images (width/height/
  * band/luma statistics from actual decoded pixels) plus the Dispatch
  * decoder routing images to it and audio/video to the deterministic stub. */
class MultimodalImageIOSpec extends SparkTestBase {
  import spark.implicits._

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIODecoder decodes real PNGs: dimensions, bands, luma stats") {
    val dec = new Multimodal.MediaDecoder.ImageIODecoder
    val white = png(32, 16, 0xffffff)
    val black = png(8, 8, 0x000000)
    val Seq(fw, fb, fe, fg) = dec.decodeBatch(Seq(
      (1L, "image", white),
      (2L, "image", black),
      (3L, "image", Array.empty[Byte]),
      (4L, "image", "not an image at all".getBytes("UTF-8")))).toSeq
    assert(fw.status === "ok")
    assert(fw.features(0) === 32f && fw.features(1) === 16f) // width, height
    assert(fw.features(2) === 3f)                            // RGB bands
    assert(fw.features(3) > 0.99f)                           // white mean luma
    assert(fw.features(4) < 0.01f)                           // flat → ~0 stddev
    assert(fw.features(5) === 2f)                            // aspect 32/16
    assert(fb.status === "ok")
    assert(fb.features(0) === 8f && fb.features(3) < 0.01f)  // black mean luma
    assert(fe.status === "empty")
    assert(fg.status === "error") // undecodable bytes fail closed, not loudly
    assert(fg.payload_bytes > 0L)
  }

  /** 16-bit PCM WAV of a sine at `freq` Hz (what a real pipeline's audio
    * column holds), generated through the same JDK API the decoder uses. */
  private def wav(freq: Double, rate: Float = 8000f, seconds: Double = 0.5,
      amplitude: Double = 0.5, channels: Int = 1): Array[Byte] = {
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2 * channels)
    (0 until n).foreach { i =>
      val s = (math.sin(2 * math.Pi * freq * i / rate) * amplitude * 32767).toInt.toShort
      (0 until channels).foreach { c =>
        val off = (i * channels + c) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
      }
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("AudioDecoder decodes real WAV bytes: rate, channels, duration, " +
      "RMS, peak, zero-crossing rate") {
    val dec = new Multimodal.MediaDecoder.AudioDecoder
    val Seq(sine, silence, stereo, junk, empty) = dec.decodeBatch(Seq(
      (1L, "audio", wav(440.0)),
      (2L, "audio", wav(440.0, amplitude = 0.0)),
      (3L, "audio", wav(220.0, channels = 2)),
      (4L, "audio", Array.tabulate[Byte](64)(_.toByte)),
      (5L, "audio", Array.empty[Byte])))
    assert(sine.status === "ok")
    assert(sine.features(0) === 8000f && sine.features(1) === 1f)
    assert(math.abs(sine.features(2) - 0.5f) < 0.01f, "duration")
    // RMS of a sine = A/√2; peak ≈ A
    assert(math.abs(sine.features(3) - 0.5 / math.sqrt(2)) < 0.01, "rms")
    assert(math.abs(sine.features(4) - 0.5) < 0.01, "peak")
    assert(sine.features(5) > 0.05f, "a sine crosses zero regularly")
    assert(sine.features(6) === 16f)
    assert(silence.status === "ok" && silence.features(3) === 0f && silence.features(4) === 0f)
    assert(stereo.status === "ok" && stereo.features(1) === 2f)
    assert(junk.status === "error" && junk.payload_bytes === 64L)
    assert(empty.status === "empty")
  }

  test("Dispatch routes images to ImageIO, audio to javax.sound, video to " +
      "the ISO-BMFF container parser, preserving input order") {
    val dec = new Multimodal.MediaDecoder.Dispatch
    val img = png(4, 4, 0x808080)
    val audioBytes = wav(440.0)
    val videoBytes = graft.etl.binary.IsoBmff.build(
      width = 640, height = 360, durationMs = 2500, frameCount = 60,
      withAudio = true, payload = Array.tabulate[Byte](64)(_.toByte))
    val out = dec.decodeBatch(Seq(
      (10L, "audio", audioBytes), (11L, "image", img), (12L, "video", videoBytes)))
    assert(out.map(_.media_id) === Seq(10L, 11L, 12L))
    assert(out(1).features(0) === 4f)    // real image decode
    assert(out(0).features(0) === 8000f) // real audio decode
    val v = out(2)                       // real container metadata decode
    assert(v.status === "ok")
    assert(v.features(0) === 640f && v.features(1) === 360f) // width, height
    assert(v.features(2) === 2.5f)                           // duration s
    assert(v.features(3) === 60f)                            // frame count
    assert(v.features(4) === 24f)                            // fps = 60/2.5
    assert(v.features(5) === 1f && v.features(6) === 1f)     // vide + soun tracks
  }

  test("VideoContainerDecoder fails closed on junk and truncated containers") {
    val dec = new Multimodal.MediaDecoder.VideoContainerDecoder
    val good = graft.etl.binary.IsoBmff.build(320, 240, 1000, 24)
    val Seq(junk, trunc, empty, ok) = dec.decodeBatch(Seq(
      (1L, "video", Array.tabulate[Byte](64)(_.toByte)),
      (2L, "video", good.take(good.length / 2)), // cut inside moov
      (3L, "video", Array.empty[Byte]),
      (4L, "video", good))).toSeq
    assert(junk.status === "error" && junk.payload_bytes === 64L)
    assert(trunc.status === "error")
    assert(empty.status === "empty")
    assert(ok.status === "ok" && ok.features(0) === 320f)
  }

  test("extractFeatures runs the ImageIO decoder distributed over a DataFrame") {
    val rows = (0 until 20).map { i =>
      (i.toLong, "image", png(4 + i % 3, 4, 0x123456 * (i + 1)))
    }
    val df = rows.toDF("media_id", "media_type", "payload").repartition(4)
    val feats = Multimodal.extractFeatures(df, new Multimodal.MediaDecoder.ImageIODecoder,
      batchSize = 8).collect().sortBy(_.media_id)
    assert(feats.length === 20)
    assert(feats.forall(_.status == "ok"))
    feats.foreach(f => assert(f.features(0) === (4 + f.media_id % 3).toFloat))
  }

  private def jpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("MJPEG AVI video gets REAL pixel decode: luma and motion are signal " +
      "statistics of the actual frames") {
    val dec = new Multimodal.MediaDecoder.VideoContainerDecoder
    // alternating dark/bright frames: high motion, mid luma
    val flicker = graft.etl.binary.RiffAvi.build(
      Seq(20, 235, 20, 235, 20, 235).map(jpeg(32, 24, _)), 32, 24, fps = 5)
    // constant mid-gray: zero-ish motion
    val still = graft.etl.binary.RiffAvi.build(
      Seq.fill(4)(jpeg(32, 24, 128)), 32, 24, fps = 5)
    val Seq(f, s) = dec.decodeBatch(Seq(
      (1L, "video", flicker), (2L, "video", still))).toSeq
    assert(f.status === "ok")
    assert(f.features(0) === 32f && f.features(1) === 24f)
    assert(f.features(3) === 6f && f.features(4) === 5f) // frames, fps
    assert(f.features(5) > 0.3f && f.features(5) < 0.7f) // mid mean luma
    assert(f.features(6) > 0.5f)                         // flicker = high motion
    assert(s.status === "ok")
    assert(math.abs(s.features(5) - 128f / 255f) < 0.05f)
    assert(s.features(6) < 0.05f)                        // still = no motion
    // an AVI whose frames are NOT decodable JPEGs fails closed
    val junkFrames = graft.etl.binary.RiffAvi.build(
      Seq(Array.tabulate[Byte](100)(_.toByte)), 8, 8)
    assert(dec.decodeBatch(Seq((3L, "video", junkFrames))).head.status === "error")
  }

  test("sampleVideoFrames emits every nth REAL frame as standalone JPEGs") {
    val grays = Seq(10, 40, 70, 100, 130, 160, 190, 220)
    val avi = graft.etl.binary.RiffAvi.build(grays.map(jpeg(16, 16, _)), 16, 16)
    val df = Seq((7L, "video", avi)).toDF("media_id", "media_type", "payload")
    val frames = Multimodal.sampleVideoFrames(df, everyNth = 3, maxFrames = 16)
      .collect().sortBy(_.getInt(1))
    // indices 0, 3, 6 of 8 frames
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 3, 6))
    assert(frames.forall(r => r.getLong(0) === 7L && r.getInt(2) === 16 && r.getInt(3) === 16))
    // each emitted frame decodes standalone and carries ITS OWN pixels
    val lumas = frames.map { r =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](4)))
      img.getRGB(8, 8) & 0xff
    }
    assert(math.abs(lumas(0) - 10) <= 8 && math.abs(lumas(1) - 100) <= 8 &&
      math.abs(lumas(2) - 190) <= 8)
    // maxFrames caps the fan-out; non-AVI payloads emit nothing
    assert(Multimodal.sampleVideoFrames(df, everyNth = 1, maxFrames = 2).count() === 2L)
    val foreign = Seq((8L, "video", Array.tabulate[Byte](64)(_.toByte)))
      .toDF("media_id", "media_type", "payload")
    assert(Multimodal.sampleVideoFrames(foreign).count() === 0L)
  }
}
