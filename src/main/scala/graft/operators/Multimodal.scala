package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed per-partition in batches.
 *
 * ALL THREE codecs are REAL on the bare JDK: images are PNG bytes decoded
 * with `javax.imageio` and resized with `Graphics2D` (headless-safe);
 * audio is WAV/PCM16 via `javax.sound.sampled`, features from the
 * waveform; video is animated GIF via `javax.imageio`'s multi-frame
 * reader/writer — per-frame decode, REAL frame sampling and spatial
 * resize that re-encode the container ([[VideoCodec]]; an ffmpeg/mp4
 * binding would replace only that object).
 * Everything around the codecs is the production shape: binary
 * column + metadata struct schema, per-partition batched processing via
 * `mapPartitions` over a typed `Dataset` (the Scala analogue of
 * `mapInPandas` batches — codec init amortized per task, not per row),
 * partition sizing independent of row width, and a columnar feature output
 * ready for [[Similarity]] search.
 */
object Multimodal {

  // ImageIO's default stream cache is a TEMP FILE per encode/decode call —
  // for the tiny per-row payloads here that's one disk roundtrip per image
  // and dominated the pipeline (q_multimodal 15 s → ~3 s at sf0.1).
  // Memory-cached streams are strictly better at our payload sizes.
  ImageIO.setUseCache(false)

  /** One media asset row: payload + typed metadata. */
  case class MediaAsset(asset_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int, n_frames: Int)

  case class MediaFeatures(asset_id: Long, media_type: String, n_bytes: Int,
      checksum: Long, features: Array[Float])

  /**
   * Real image codec on the JDK only. Features are an 8-dim pixel summary:
   * mean R/G/B, mean luma, and the four quadrant mean lumas (all in [0,1]) —
   * enough signal for near-dup search over [[Similarity]] while staying
   * exactly reproducible in a spec.
   */
  object ImageCodec {
    val FeatureDim = 8

    /** Deterministic tiny RGB test image: pixel colors derive from (id, x, y). */
    def synthesize(id: Long, w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val buf = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((id * 31 + x * 7 + y * 13) & 0xff).toInt
          val g = ((id * 17 + x * 3 + y * 29) & 0xff).toInt
          val b = ((id * 11 + x * 19 + y * 5) & 0xff).toInt
          buf(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      img.setRGB(0, 0, w, h, buf, 0, w)
      img
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def synthesizePng(id: Long, w: Int, h: Int): Array[Byte] =
      encodePng(synthesize(id, w, h))

    def decode(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      img
    }

    /** 8-dim feature vector from decoded pixels:
     *  [meanR, meanG, meanB, meanLuma, lumaTL, lumaTR, lumaBL, lumaBR]. */
    def embed(img: BufferedImage): Array[Float] = {
      val w = img.getWidth
      val h = img.getHeight
      var sr, sg, sb, sl = 0.0
      val qSum = new Array[Double](4)
      val qCnt = new Array[Long](4)
      // bulk row reads: per-pixel getRGB pays a color-model conversion call
      // per pixel and dominated the decode pass (~2/3 of q_multimodal's time)
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          val luma = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += luma
          val q = (if (y * 2 < h) 0 else 2) + (if (x * 2 < w) 0 else 1)
          qSum(q) += luma; qCnt(q) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val f = new Array[Float](FeatureDim)
      f(0) = (sr / n / 255.0).toFloat
      f(1) = (sg / n / 255.0).toFloat
      f(2) = (sb / n / 255.0).toFloat
      f(3) = (sl / n / 255.0).toFloat
      var q = 0
      while (q < 4) {
        f(4 + q) = if (qCnt(q) > 0) (qSum(q) / qCnt(q) / 255.0).toFloat else 0.0f
        q += 1
      }
      f
    }

    /** Real resize: decode → Graphics2D bilinear scale → re-encode PNG. */
    def resizePng(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val src = decode(payload)
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      encodePng(dst)
    }
  }

  /**
   * Real audio codec on the JDK only (`javax.sound.sampled`): WAV/PCM
   * decode to samples, features from the waveform. Same production shape as
   * [[ImageCodec]] — synthesize (for tests), encode, decode, embed.
   */
  object AudioCodec {
    val FeatureDim = 8
    val SampleRate = 8000f

    /** Deterministic PCM16 mono test tone: frequency and amplitude derive
     *  from the id; `n` samples at 8 kHz. */
    def synthesizePcm(id: Long, n: Int): Array[Short] = {
      val freq = 200.0 + (id % 17) * 60.0
      val amp = 8000.0 + (id % 7) * 2000.0
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        out(i) = (amp * math.sin(2 * math.Pi * freq * i / SampleRate)).toShort
        i += 1
      }
      out
    }

    /** Encode PCM16 mono samples as a WAV container via javax.sound. */
    def encodeWav(samples: Array[Short]): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(SampleRate, 16, 1, true, false)
      val stream = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val out = new ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(stream,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    def synthesizeWav(id: Long, n: Int): Array[Byte] = encodeWav(synthesizePcm(id, n))

    /** Decode a WAV payload to PCM16 samples (mono or first channel). */
    def decode(payload: Array[Byte]): Array[Short] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16, s"expected PCM16, got $fmt")
        val raw = in.readAllBytes()
        val channels = fmt.getChannels
        val frame = 2 * channels
        val n = raw.length / frame
        val out = new Array[Short](n)
        val le = !fmt.isBigEndian
        var i = 0
        while (i < n) {
          val lo = raw(i * frame) & 0xff
          val hi = raw(i * frame + 1)
          out(i) = (if (le) (hi << 8) | lo else (lo << 8) | (hi & 0xff)).toShort
          i += 1
        }
        out
      } finally in.close()
    }

    /** 8-dim waveform summary: [rms, zeroCrossRate, peak, mean] + the four
     *  quarter-segment rms values (all normalized to [0,1]). */
    def embed(samples: Array[Short]): Array[Float] = {
      val n = math.max(samples.length, 1)
      var sumSq = 0.0
      var sum = 0.0
      var crossings = 0L
      var peak = 0.0
      val qSq = new Array[Double](4)
      val qN = new Array[Long](4)
      var i = 0
      while (i < samples.length) {
        val v = samples(i).toDouble
        sumSq += v * v; sum += v
        peak = math.max(peak, math.abs(v))
        if (i > 0 && (samples(i) >= 0) != (samples(i - 1) >= 0)) crossings += 1
        val q = math.min(i * 4 / n, 3)
        qSq(q) += v * v; qN(q) += 1
        i += 1
      }
      val f = new Array[Float](FeatureDim)
      val full = 32768.0
      f(0) = (math.sqrt(sumSq / n) / full).toFloat
      f(1) = crossings.toFloat / n
      f(2) = (peak / full).toFloat
      f(3) = ((sum / n) / full + 0.5).toFloat
      var q = 0
      while (q < 4) {
        f(4 + q) = if (qN(q) > 0) (math.sqrt(qSq(q) / qN(q)) / full).toFloat else 0f
        q += 1
      }
      f
    }
  }

  /**
   * Real VIDEO codec on the JDK only: animated GIF via `javax.imageio`
   * (the one multi-frame container the JDK can both read and write).
   * Stands in structurally for an ffmpeg binding — the Spark-side contract
   * (opaque binary payload, frame count metadata, per-partition batched
   * decode, REAL frame sampling and spatial resize that re-encode the
   * container) is identical; swapping in mp4/h264 means replacing only
   * this object.
   */
  object VideoCodec {
    val FeatureDim = 8

    /** Deterministic animated test clip: each frame is an [[ImageCodec]]
     *  synthetic image advanced by the frame index (so consecutive frames
     *  differ — motion features have signal). */
    def synthesizeGif(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val frame = ImageCodec.synthesize(id + f * 7, w, h)
          writer.writeToSequence(new javax.imageio.IIOImage(frame, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      out.toByteArray
    }

    /** Decode every frame of a GIF payload. */
    def decodeFrames(payload: Array[Byte]): Seq[BufferedImage] = {
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        (0 until n).map(reader.read)
      } finally { reader.dispose(); iis.close() }
    }

    /** Re-encode frames as a GIF. */
    def encodeGif(frames: Seq[BufferedImage]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach(f =>
          writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      out.toByteArray
    }

    /** 8-dim clip summary: [nFrames/30, mean luma, first/mid/last frame
     *  lumas, motion (mean |Δluma| between consecutive frames), w/64, h/64]. */
    def embed(frames: Seq[BufferedImage]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      if (frames.isEmpty) return f
      val lumas = frames.map(fr => ImageCodec.embed(fr)(3)) // mean luma per frame
      val n = frames.length
      f(0) = n / 30.0f
      f(1) = (lumas.sum / n).toFloat
      f(2) = lumas.head
      f(3) = lumas(n / 2)
      f(4) = lumas.last
      f(5) = if (n > 1)
        (lumas.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.sum / (n - 1)).toFloat
      else 0f
      f(6) = frames.head.getWidth / 64.0f
      f(7) = frames.head.getHeight / 64.0f
      f
    }
  }

  /**
   * Byte-projection fallback decoder — the degrade path [[extractFeatures]]
   * takes for payloads the real codecs reject (and the checksum helper).
   * Deterministic.
   */
  object MediaCodecStub {
    val FeatureDim = 8
    def decodeAndEmbed(payload: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
    def checksum(payload: Array[Byte]): Long = {
      val crc = new java.util.zip.CRC32()
      crc.update(payload)
      crc.getValue
    }
  }

  /**
   * Synthesize a media-asset table from any text corpus. Image assets carry
   * REAL (tiny, deterministic) PNG payloads, audio assets REAL WAV payloads;
   * video carries the utf-8 text bytes as an opaque stand-in stream.
   */
  def syntheticAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    // Codec work scales with ROWS, not input bytes — Spark's scan
    // partitioning follows maxPartitionBytes, so a small metadata table
    // (5000 doc rows ≈ one parquet split) would run the whole
    // decode/encode pipeline on ONE core (measured: 19 s single-threaded
    // vs ~2 s spread, sf0.1 local[32]). Repartition to the cluster's
    // parallelism BEFORE the per-row codec stages; at 100 TB this is the
    // difference between a decode stage using every executor or one task.
    val base = docs.repartition(spark.sparkContext.defaultParallelism).select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 16).cast("int").as("width"),
      (col("doc_id") % 480 + 16).cast("int").as("height"),
      (col("doc_id") % 30 + 1).cast("int").as("n_frames")
    ).as[MediaAsset]
    base.mapPartitions { it =>
      it.map { a =>
        a.media_type match {
          case "image" =>
            // small real PNGs: width/height metadata matches the actual pixels
            val w = (a.asset_id % 24 + 8).toInt
            val h = (a.asset_id % 16 + 8).toInt
            a.copy(payload = ImageCodec.synthesizePng(a.asset_id, w, h),
              width = w, height = h)
          case "audio" =>
            a.copy(payload = AudioCodec.synthesizeWav(a.asset_id,
              (a.asset_id % 400 + 100).toInt))
          case _ =>
            // small real animated GIFs; n_frames metadata matches the clip
            val w = (a.asset_id % 12 + 8).toInt
            val h = (a.asset_id % 8 + 8).toInt
            val nf = (a.asset_id % 5 + 2).toInt
            a.copy(payload = VideoCodec.synthesizeGif(a.asset_id, w, h, nf),
              width = w, height = h, n_frames = nf)
        }
      }
    }
  }

  /**
   * The batched decode/feature-extract pass. `mapPartitions` keeps the codec
   * initialization per-task (not per-row) — the property that matters when
   * the decoder has setup cost. Every media type goes through its REAL
   * decoder (PNG / WAV / the documented video stand-in); a payload the
   * decoder rejects degrades to [[MediaCodecStub.decodeAndEmbed]]'s
   * byte-projection features instead of killing the task — at pipeline
   * scale one corrupt blob among billions must not fail the stage, and the
   * deterministic fallback keeps the row (with its checksum) visible for
   * downstream quality filters to drop.
   */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val feats =
          try a.media_type match {
            case "image" => ImageCodec.embed(ImageCodec.decode(a.payload))
            case "audio" => AudioCodec.embed(AudioCodec.decode(a.payload))
            case _ =>
              val frames = VideoCodec.decodeFrames(a.payload)
              // the GIF reader yields ZERO frames for a non-GIF payload
              // rather than throwing — zero frames is "not decodable" too
              require(frames.nonEmpty, "no decodable frames")
              VideoCodec.embed(frames)
          } catch { case scala.util.control.NonFatal(_) =>
            MediaCodecStub.decodeAndEmbed(a.payload)
          }
        MediaFeatures(a.asset_id, a.media_type, a.payload.length,
          MediaCodecStub.checksum(a.payload), feats)
      }
    }
  }

  /**
   * Resize pass (a SPATIAL op). Images: REAL decode → Graphics2D scale →
   * PNG re-encode. Audio has no spatial dims: payload passes through
   * untouched (time-resampling is a different op). Video: REAL per-frame
   * Graphics2D scale + GIF re-encode.
   */
  def resize(assets: Dataset[MediaAsset], width: Int, height: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        a.media_type match {
          case "image" =>
            a.copy(payload = ImageCodec.resizePng(a.payload, width, height),
              width = width, height = height)
          case "audio" => a.copy(width = width, height = height) // no spatial payload
          case _ =>
            val scaled = VideoCodec.decodeFrames(a.payload).map { src =>
              val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              try {
                g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(src, 0, 0, width, height, null)
              } finally g.dispose()
              dst
            }
            a.copy(payload = VideoCodec.encodeGif(scaled),
              width = width, height = height)
        }
      }
    }
  }

  /**
   * REAL frame sampling: decode the clip, keep every `everyN`-th frame,
   * re-encode (metadata-consistent: n_frames matches the re-encoded clip);
   * non-video assets pass through untouched.
   */
  def frameSample(assets: Dataset[MediaAsset], everyN: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.media_type != "video" || a.n_frames <= 1) a
        else {
          val frames = VideoCodec.decodeFrames(a.payload)
          val kept = frames.zipWithIndex.collect {
            case (f, i) if i % everyN == 0 => f
          }
          a.copy(n_frames = kept.length, payload = VideoCodec.encodeGif(kept))
        }
      }
    }
  }

  /** End-to-end query: synthesize → resize → frame-sample → extract →
   *  aggregate per media type. */
  def featureSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    val prepared = frameSample(resize(syntheticAssets(spark, docs), 64, 64), everyN = 5)
    val feats = extractFeatures(prepared)
    feats.toDF()
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_assets"),
        sum("n_bytes").as("total_bytes"),
        // decimal avg: float summation order varies with partitioning, so a
        // double avg is only ~15-digit reproducible; decimal is exact and
        // order-independent, which lets the query carry a literal oracle
        round(avg(element_at(col("features"), 1).cast("decimal(18,9)")), 6)
          .cast("double").as("avg_f0"))
      .orderBy("media_type")
  }
}
