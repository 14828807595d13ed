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

  test("Dispatch routes images to ImageIO and other modalities to the stub, " +
      "preserving input order") {
    val dec = new Multimodal.MediaDecoder.Dispatch
    val stub = new Multimodal.MediaDecoder.Deterministic()
    val img = png(4, 4, 0x808080)
    val audio = Array.tabulate[Byte](64)(_.toByte)
    val out = dec.decodeBatch(Seq(
      (10L, "audio", audio), (11L, "image", img), (12L, "video", audio)))
    assert(out.map(_.media_id) === Seq(10L, 11L, 12L))
    assert(out(1).features(0) === 4f) // real decode
    assert(out(0).features.toSeq === stub.decodeBatch(Seq((10L, "audio", audio))).head.features.toSeq)
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
}
