package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed per-partition in batches.
 *
 * The actual media decode is STUBBED (no image/audio libraries in this
 * environment) behind [[MediaCodecStub]] — a deterministic fake that derives
 * "features" from the payload bytes. Everything around it is the real
 * production shape: binary column + metadata struct schema, per-partition
 * batched processing via `mapPartitions` over a typed `Dataset` (the Scala
 * analogue of `mapInPandas` batches), partition sizing independent of row
 * width, and a columnar feature output ready for [[Similarity]] search.
 */
object Multimodal {

  /** One media asset row: payload + typed metadata. */
  case class MediaAsset(asset_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int, n_frames: Int)

  case class MediaFeatures(asset_id: Long, media_type: String, n_bytes: Int,
      checksum: Long, features: Array[Float])

  /**
   * STUB decoder: stands in for libjpeg/ffmpeg. Deterministic: features are
   * a fixed-size projection of the payload bytes, so tests are exact.
   * Swap this object for a real codec binding in production.
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

  /** Synthesize a media-asset table from any text corpus (payload = utf-8 bytes). */
  def syntheticAssets(spark: SparkSession, docs: DataFrame): Dataset[MediaAsset] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 16).cast("int").as("width"),
      (col("doc_id") % 480 + 16).cast("int").as("height"),
      (col("doc_id") % 30 + 1).cast("int").as("n_frames")
    ).as[MediaAsset]
  }

  /**
   * The batched decode/feature-extract pass. `mapPartitions` keeps the codec
   * initialization per-task (not per-row) — the property that matters when
   * the real decoder has setup cost.
   */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition "codec init" would go here
      it.map { a =>
        MediaFeatures(a.asset_id, a.media_type, a.payload.length,
          MediaCodecStub.checksum(a.payload), MediaCodecStub.decodeAndEmbed(a.payload))
      }
    }
  }

  /**
   * STUB resize: stands in for an image scaler. The Spark-side contract is
   * real — metadata updated, payload transformed per partition in batches,
   * deterministic output — only the pixel math is fake (truncate/pad the
   * payload to the implied byte budget).
   */
  def resize(assets: Dataset[MediaAsset], width: Int, height: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition "scaler init" would go here
      it.map { a =>
        val budget = math.max(16, (a.payload.length.toLong * width * height /
          math.max(a.width.toLong * a.height, 1)).toInt)
        val p = java.util.Arrays.copyOf(a.payload, budget)
        a.copy(payload = p, width = width, height = height)
      }
    }
  }

  /**
   * STUB frame sampling: keep every `everyN`-th frame of video assets
   * (metadata-consistent: n_frames and payload shrink together); non-video
   * assets pass through untouched.
   */
  def frameSample(assets: Dataset[MediaAsset], everyN: Int): Dataset[MediaAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.media_type != "video" || a.n_frames <= 1) a
        else {
          val kept = math.max(1, (a.n_frames + everyN - 1) / everyN)
          val bytesPerFrame = math.max(1, a.payload.length / math.max(a.n_frames, 1))
          a.copy(n_frames = kept,
            payload = java.util.Arrays.copyOf(a.payload, kept * bytesPerFrame))
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
        round(avg(element_at(col("features"), 1)), 6).as("avg_f0"))
      .orderBy("media_type")
  }
}
