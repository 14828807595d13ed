package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines (builder mandate):
  * image/audio/video as opaque `binary` columns with typed metadata, and
  * decode / feature-extract stages shaped the way a real pipeline shapes
  * them — batched `mapPartitions` with a pluggable decoder.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, null
  * handling) is REAL and tested, and so is every modality's decodable
  * layer: images decode through JDK ImageIO
  * ([[MediaDecoder.ImageIODecoder]]), audio through JDK javax.sound.sampled
  * ([[MediaDecoder.AudioDecoder]]), and video through TWO real layers:
  * CONTAINER metadata for ISO-BMFF/MP4 (in-house box parser,
  * [[graft.etl.binary.IsoBmff]]) and full per-frame PIXEL decode for
  * Motion-JPEG AVI (in-house RIFF parser [[graft.etl.binary.RiffAvi]] +
  * ImageIO per frame, [[MediaDecoder.VideoContainerDecoder]],
  * [[sampleVideoFrames]]) — no external codec jars anywhere. The only
  * remaining stub is pixel decode of INTER-FRAME codecs (H.264 etc.; the
  * JDK genuinely ships none); swap a frame decoder (JNI/JavaCV/etc.) in
  * behind the same trait for production. This mirrors a Python
  * `mapInPandas` pandas-UDF stage: the decoder receives a BATCH of
  * payloads (amortizing per-call model/codec setup), not one row at a
  * time.
  */
object Multimodal {

  /** media schema: opaque payload + typed metadata (no parsing at scan). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      payload_bytes: Long,
      /** fixed-dim feature vector (fake under the stub decoder) */
      features: Array[Float],
      /** decode status: ok | empty | error */
      status: String)

  /** Batched decoder contract (≙ a pandas UDF body: one call per batch). */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures]
  }

  object MediaDecoder {

    /** REAL image decode via JDK-only `javax.imageio` (PNG/JPEG/GIF/BMP ship
      * with the JDK — no external codec needed): features are actual image
      * statistics. Audio/video stay on [[Deterministic]] (their codecs are
      * genuinely absent here); [[Dispatch]] composes the two by media_type.
      *
      * Feature vector (dim 8, all deterministic):
      * [width, height, bands, mean luma/255, stddev luma/255, aspect ratio,
      *  log10(payload bytes), fraction of sampled pixels brighter than mean].
      * Undecodable payloads (truncated/foreign bytes) → status "error". */
    final class ImageIODecoder extends MediaDecoder {
      override def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures] =
        batch.map { case (id, mtype, payload) =>
          if (payload == null || payload.isEmpty)
            MediaFeatures(id, mtype, 0L, Array.fill(8)(0f), "empty")
          else {
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
              catch { case _: Exception => null }
            if (img == null)
              MediaFeatures(id, mtype, payload.length.toLong, Array.fill(8)(0f), "error")
            else {
              val w = img.getWidth; val h = img.getHeight
              val bands = img.getRaster.getNumBands
              // bounded sampling grid: decode stats must not scale with
              // megapixels (the batch, not the pixel count, is the unit here)
              val stepX = math.max(1, w / 64); val stepY = math.max(1, h / 64)
              var n = 0; var sum = 0.0; var sumSq = 0.0
              val lumas = new scala.collection.mutable.ArrayBuffer[Double]()
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val luma = 0.299 * ((rgb >> 16) & 0xff) +
                    0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                  lumas += luma; sum += luma; sumSq += luma * luma; n += 1
                  x += stepX
                }
                y += stepY
              }
              val mean = sum / n
              val variance = math.max(0.0, sumSq / n - mean * mean)
              val brightFrac = lumas.count(_ > mean).toDouble / n
              MediaFeatures(id, mtype, payload.length.toLong,
                Array(w.toFloat, h.toFloat, bands.toFloat,
                  (mean / 255.0).toFloat, (math.sqrt(variance) / 255.0).toFloat,
                  (w.toDouble / h).toFloat,
                  math.log10(payload.length.toDouble).toFloat,
                  brightFrac.toFloat), "ok")
            }
          }
        }
    }

    /** REAL audio decode via JDK-only `javax.sound.sampled` (WAV/AIFF/AU
      * ship with the JDK — no external codec needed): features are actual
      * signal statistics. Non-PCM-16 payloads are converted through the
      * JDK's own format-conversion chain first.
      *
      * Feature vector (dim 8, all deterministic):
      * [sample rate, channels, duration seconds, RMS (0..1), peak (0..1),
      *  zero-crossing rate, bits/sample, log10(payload bytes)].
      * Undecodable payloads (truncated/foreign bytes) → status "error". */
    final class AudioDecoder extends MediaDecoder {
      override def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures] =
        batch.map { case (id, mtype, payload) =>
          if (payload == null || payload.isEmpty)
            MediaFeatures(id, mtype, 0L, Array.fill(8)(0f), "empty")
          else {
            try {
              val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(payload))
              val srcFmt = raw.getFormat
              val bits = srcFmt.getSampleSizeInBits
              // normalize to 16-bit signed PCM, preserving rate/channels —
              // one sample-parsing path whatever the container encoding
              val fmt = new javax.sound.sampled.AudioFormat(
                srcFmt.getSampleRate, 16, srcFmt.getChannels, true, false)
              val ais =
                if (srcFmt.matches(fmt)) raw
                else javax.sound.sampled.AudioSystem.getAudioInputStream(fmt, raw)
              try {
                val frameSize = fmt.getFrameSize // channels * 2
                // STREAMING stats in O(1) memory: a fixed frame-aligned
                // buffer, sampling every `step`-th frame of channel 0 — an
                // hour-long stereo track must not materialize as one
                // in-memory PCM array. `step` comes from the container's
                // frame count when known (WAV/AIFF headers carry it; the
                // PCM conversion preserves frame count); unknown-length
                // streams sample every frame up to a hard cap.
                val declaredFrames = raw.getFrameLength
                val step = if (declaredFrames > 0) math.max(1L, declaredFrames / 65536) else 1L
                val maxSamples = 1 << 20
                val buf = new Array[Byte](frameSize * 4096)
                var carry = 0 // bytes of a split frame carried between reads
                var frameIdx = 0L; var n = 0
                var sumSq = 0.0; var peak = 0.0; var crossings = 0
                var prevNeg = false
                var eof = false
                while (!eof) {
                  val read = ais.read(buf, carry, buf.length - carry)
                  if (read < 0) eof = true
                  else {
                    val avail = carry + read
                    val whole = (avail / frameSize) * frameSize
                    var off = 0
                    while (off < whole) {
                      if (frameIdx % step == 0 && n < maxSamples) {
                        val s = ((buf(off + 1) << 8) | (buf(off) & 0xff)).toShort / 32768.0
                        sumSq += s * s
                        if (math.abs(s) > peak) peak = math.abs(s)
                        val neg = s < 0
                        if (n > 0 && neg != prevNeg) crossings += 1
                        prevNeg = neg
                        n += 1
                      }
                      frameIdx += 1
                      off += frameSize
                    }
                    carry = avail - whole
                    if (carry > 0) System.arraycopy(buf, whole, buf, 0, carry)
                  }
                }
                val durationSec =
                  if (fmt.getSampleRate > 0) frameIdx / fmt.getSampleRate else 0f
                val rms = if (n > 0) math.sqrt(sumSq / n) else 0.0
                val zcr = if (n > 1) crossings.toDouble / (n - 1) else 0.0
                MediaFeatures(id, mtype, payload.length.toLong,
                  Array(fmt.getSampleRate, fmt.getChannels.toFloat, durationSec,
                    rms.toFloat, peak.toFloat, zcr.toFloat, bits.toFloat,
                    math.log10(payload.length.toDouble).toFloat), "ok")
              } finally ais.close()
            } catch {
              case _: Exception =>
                MediaFeatures(id, mtype, payload.length.toLong, Array.fill(8)(0f), "error")
            }
          }
        }
    }

    /** REAL video decode, two layers deep (JDK-only):
      *  - MJPEG AVI ([[graft.etl.binary.RiffAvi]]): full PIXEL decode —
      *    each `00dc` frame is an ordinary JPEG that ImageIO reads; the
      *    features are actual signal statistics over a bounded, evenly
      *    spaced frame sample (≤ 8 frames, 64×64 luma grid each — decode
      *    cost must not scale with clip length or megapixels).
      *  - ISO-BMFF/MP4 ([[graft.etl.binary.IsoBmff]]): CONTAINER metadata
      *    — dimensions, duration, frame count, track inventory from the
      *    actual box tree. Pixel decode of inter-frame codecs stays out of
      *    reach in this environment (the JDK ships no such codec); a
      *    production build swaps a frame decoder in behind the same trait.
      *
      * Feature vector (dim 8, all deterministic):
      *  AVI: [width, height, duration seconds, frame count, fps,
      *        mean luma/255, mean |inter-frame luma delta|/255, log10 bytes]
      *  MP4: [width, height, duration seconds, frame count, fps,
      *        video tracks, audio tracks, log10 bytes].
      * Truncated/foreign payloads → status "error". */
    final class VideoContainerDecoder extends MediaDecoder {
      override def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures] =
        batch.map { case (id, mtype, payload) =>
          if (payload == null || payload.isEmpty)
            MediaFeatures(id, mtype, 0L, Array.fill(8)(0f), "empty")
          else graft.etl.binary.RiffAvi.parse(payload) match {
            case Some(avi) => decodeAvi(id, mtype, payload, avi)
            case None => graft.etl.binary.IsoBmff.parse(payload) match {
              case None =>
                MediaFeatures(id, mtype, payload.length.toLong, Array.fill(8)(0f), "error")
              case Some(info) =>
                val durS = info.durationMs / 1000.0
                val fps = if (durS > 0) info.frameCount / durS else 0.0
                MediaFeatures(id, mtype, payload.length.toLong,
                  Array(info.width.toFloat, info.height.toFloat, durS.toFloat,
                    info.frameCount.toFloat, fps.toFloat,
                    info.videoTracks.toFloat, info.audioTracks.toFloat,
                    math.log10(payload.length.toDouble).toFloat), "ok")
            }
          }
        }

      private def decodeAvi(id: Long, mtype: String, payload: Array[Byte],
          avi: graft.etl.binary.RiffAvi.AviInfo): MediaFeatures = {
        val slices = avi.frameSlices
        // even sample of ≤ 8 frames across the clip
        val take = math.min(8, slices.size)
        val sampled = (0 until take).map(i => slices(i * slices.size / math.max(1, take)))
        val lumas = sampled.flatMap { s =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
              graft.etl.binary.RiffAvi.frame(payload, s)))
            catch { case _: Exception => null }
          if (img == null) None else Some(meanLuma(img))
        }
        if (slices.nonEmpty && lumas.isEmpty)
          return MediaFeatures(id, mtype, payload.length.toLong, Array.fill(8)(0f), "error")
        val meanL = if (lumas.isEmpty) 0.0 else lumas.sum / lumas.size
        val motion =
          if (lumas.size < 2) 0.0
          else lumas.zip(lumas.tail).map { case (a, b) => math.abs(b - a) }.sum / (lumas.size - 1)
        val durS = avi.durationMs / 1000.0
        MediaFeatures(id, mtype, payload.length.toLong,
          Array(avi.width.toFloat, avi.height.toFloat, durS.toFloat,
            slices.size.toFloat, avi.fps.toFloat,
            (meanL / 255.0).toFloat, (motion / 255.0).toFloat,
            math.log10(payload.length.toDouble).toFloat), "ok")
      }

      /** bounded 64×64 luma sampling grid (same shape as ImageIODecoder's) */
      private def meanLuma(img: java.awt.image.BufferedImage): Double = {
        val w = img.getWidth; val h = img.getHeight
        val stepX = math.max(1, w / 64); val stepY = math.max(1, h / 64)
        var n = 0; var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            n += 1
            x += stepX
          }
          y += stepY
        }
        if (n == 0) 0.0 else sum / n
      }
    }

    /** Production shape: REAL decode for every modality's decodable layer —
      * images via ImageIO, audio via javax.sound.sampled, video via MJPEG
      * pixel decode (AVI) or ISO-BMFF container metadata (MP4; inter-frame
      * pixel decode alone remains environment-stubbed); anything else falls
      * back to the deterministic stub. */
    final class Dispatch(dim: Int = 8) extends MediaDecoder {
      private val image = new ImageIODecoder
      private val audio = new AudioDecoder
      private val video = new VideoContainerDecoder
      private val other = new Deterministic(dim)
      override def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures] = {
        // reassemble POSITIONALLY (not by media_id: duplicate ids within a
        // batch — re-delivered rows, id collisions across modalities — must
        // each keep their own row's decode, like the per-row decoders do)
        val indexed = batch.zipWithIndex
        val out = new Array[MediaFeatures](batch.size)
        def run(dec: MediaDecoder, part: Seq[((Long, String, Array[Byte]), Int)]): Unit =
          dec.decodeBatch(part.map(_._1)).zip(part).foreach { case (f, (_, i)) => out(i) = f }
        run(image, indexed.filter(_._1._2 == "image"))
        run(audio, indexed.filter(_._1._2 == "audio"))
        run(video, indexed.filter(_._1._2 == "video"))
        run(other, indexed.filterNot(e =>
          e._1._2 == "image" || e._1._2 == "audio" || e._1._2 == "video"))
        out.toSeq
      }
    }

    /** STUB: deterministic fake features derived from the payload bytes —
      * stands in for the audio/video codecs absent in this environment.
      * Images have a real decoder: [[ImageIODecoder]]. */
    final class Deterministic(dim: Int = 8) extends MediaDecoder {
      override def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[MediaFeatures] =
        batch.map { case (id, mtype, payload) =>
          if (payload == null || payload.isEmpty)
            MediaFeatures(id, mtype, 0L, Array.fill(dim)(0f), "empty")
          else {
            val feats = Array.tabulate(dim) { i =>
              // seeded fold over the bytes — stands in for codec output
              var h = 1125899906842597L + i
              payload.foreach(b => h = 31 * h + b)
              ((h >>> 16) % 1000).toFloat / 1000f
            }
            MediaFeatures(id, mtype, payload.length.toLong, feats, "ok")
          }
        }
    }
  }

  /** Feature extraction stage: batched mapPartitions (batch size bounds
    * decoder memory; rows stream through — no whole-partition
    * materialization). Input needs (media_id, media_type, payload). */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select(col("media_id"), col("media_type"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { chunk =>
          decoder.decodeBatch(chunk.map(r =>
            (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))))
        }
      }
  }

  /** Frame-sample stage shape (video → every nth "frame" slice of the
    * payload): demonstrates generator-style multimodal fan-out with bounded
    * output (explode of a size-limited sequence, not a UDTF). The slicing
    * is the STUB for codecs this environment can't open; MJPEG AVI has the
    * REAL version: [[sampleVideoFrames]]. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256, everyNth: Int = 4,
      maxFrames: Int = 16): DataFrame =
    media
      .withColumn("_nframes",
        least(floor(length(col("payload")) / frameBytes / everyNth), lit(maxFrames)).cast("int"))
      .filter(col("_nframes") >= 1) // sequence(1, 0) would run descending
      .select(col("media_id"), col("media_type"),
        posexplode(expr(
          s"transform(sequence(1, _nframes), " +
            s"f -> substring(payload, (f - 1) * $frameBytes * $everyNth + 1, $frameBytes))"))
          .as(Seq("frame_idx", "frame_payload")))

  /** REAL frame sampling for MJPEG AVI payloads ([[graft.etl.binary.RiffAvi]]):
    * every `everyNth` frame up to `maxFrames`, emitted as standalone JPEG
    * bytes (each directly `ImageIO.read`-able downstream — the natural
    * input to an image-embedding stage). Frames the sampler skips are
    * NEVER copied or decoded — the container parse yields byte slices, so
    * per-row cost is O(frames kept), not O(clip length). Non-AVI payloads
    * produce no rows (route them through [[sampleFrames]]' stub shape or a
    * production codec instead).
    *
    * Output: (media_id, frame_idx ORIGINAL index in the clip, width,
    * height — container-declared, no decode needed — frame_jpeg). */
  def sampleVideoFrames(media: DataFrame, everyNth: Int = 4, maxFrames: Int = 16): DataFrame = {
    require(everyNth > 0, s"everyNth must be positive, got $everyNth")
    require(maxFrames >= 0, s"maxFrames must be non-negative, got $maxFrames")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("frame_jpeg", BinaryType, nullable = false)))
    implicit val enc = Encoders.row(schema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          graft.etl.binary.RiffAvi.parse(payload).toSeq.flatMap { avi =>
            avi.frameSlices.zipWithIndex
              .collect { case (s, i) if i % everyNth == 0 => (s, i) }
              .take(maxFrames)
              .map { case (s, i) =>
                org.apache.spark.sql.Row(id, i, avi.width, avi.height,
                  graft.etl.binary.RiffAvi.frame(payload, s))
              }
          }
        }
      }
  }
}
