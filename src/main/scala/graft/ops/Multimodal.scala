package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed rows for multimodal payloads: media is an opaque `binary` column
  * plus a typed metadata struct. Matches how a 100 TB media lake actually
  * stores content — bytes in parquet/object storage, decode at use site.
  */
case class MediaMeta(
    mediaType: String, // "image" | "audio" | "video"
    codec: String,
    width: Int,        // images/video; 0 otherwise
    height: Int,
    sampleRateHz: Int, // audio; 0 otherwise
    durationMs: Long   // audio/video; 0 for images
)

case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

case class ImageFeatures(
    media_id: Long,
    width: Int,
    height: Int,
    channels: Int,
    meanLuma: Double,
    histogram: Array[Long] // 16-bin luma histogram
)

case class AudioFeatures(
    media_id: Long,
    sampleRateHz: Int,
    nFrames: Long,
    rms: Double
)

case class VideoFrame(media_id: Long, frameIndex: Int, payload: Array[Byte])

/** The codec boundary: everything the operators in [[Multimodal]] need from
  * a real media stack. A deployment slots in an implementation backed by
  * libjpeg / libsndfile / ffmpeg WITHOUT touching the operators — the
  * Spark-side plumbing (typed schemas, per-partition batching, size-aware
  * repartitioning) is codec-agnostic.
  *
  * Contract: implementations are `Serializable` (constructed on the driver,
  * shipped once per task) and must treat heavyweight native contexts as
  * lazy/transient so they initialize per executor, not per row — the
  * operators call through `mapPartitions`, so per-partition amortization is
  * already in place.
  */
trait MediaDecoder extends Serializable {

  /** Decode an image payload → (width, height, channels, luma stream). */
  def decodeImage(payload: Array[Byte]): (Int, Int, Int, Iterator[Int])

  /** Decode an audio payload → PCM samples in [-1, 1]. */
  def decodeAudio(payload: Array[Byte]): Iterator[Double]

  /** Re-encode an image payload at a new size. */
  def resizeImage(
      payload: Array[Byte],
      width: Int, height: Int,
      newWidth: Int, newHeight: Int): Array[Byte]

  /** Split a video payload into encoded frames, in order. */
  def videoFrames(payload: Array[Byte]): Iterator[Array[Byte]]
}

/** STUB decoder — the deterministic fake used in this codec-less
  * environment (no libjpeg/ffmpeg in the sandbox). Every output is a pure
  * function of the payload bytes, so operator behavior is testable
  * end-to-end; a real deployment replaces this object, nothing else.
  */
case class StubDecoder(frameBytes: Int = 256) extends MediaDecoder {

  def decodeImage(payload: Array[Byte]): (Int, Int, Int, Iterator[Int]) = {
    val w = 16 + (math.abs(java.util.Arrays.hashCode(payload)) % 64)
    val h = 16 + (math.abs(java.util.Arrays.hashCode(payload) / 64) % 64)
    // zero-byte payloads (truncated/corrupt files are routine in scraped
    // corpora) decode to all-black rather than killing the task
    val lumas =
      if (payload.isEmpty) Iterator.fill(w * h)(0)
      else Iterator.tabulate(w * h) { i =>
        java.lang.Byte.toUnsignedInt(payload(i % payload.length))
      }
    (w, h, 3, lumas)
  }

  def decodeAudio(payload: Array[Byte]): Iterator[Double] =
    payload.iterator.map(b => b.toDouble / 128.0)

  def resizeImage(
      payload: Array[Byte],
      width: Int, height: Int,
      newWidth: Int, newHeight: Int): Array[Byte] = {
    // STUB: truncates bytes proportionally to the pixel-count change so
    // downstream size accounting stays realistic.
    val scaleSq = (newWidth.toDouble * newHeight) / math.max(1, width * height)
    payload.take(math.max(1, (payload.length * scaleSq).toInt))
  }

  def videoFrames(payload: Array[Byte]): Iterator[Array[Byte]] =
    // STUB: fixed-size chunks standing in for codec frame parsing
    payload.grouped(frameBytes)
}

/** Multimodal column operators: decode, feature-extract, resize,
  * frame-sample — all parameterized by a [[MediaDecoder]] (default:
  * [[StubDecoder]]). The Spark side is real and load-bearing: typed schemas
  * via case-class Encoders, per-partition batch processing (`mapPartitions`
  * — the Scala analogue of `mapInPandas` batching), and size-aware
  * repartitioning so big payloads don't skew executors.
  */
object Multimodal {

  /** Read a directory of raw media files as (path, length, bytes) — Spark's
    * binaryFile source; the standard entry for image/audio lakes.
    */
  def readBinaryDir(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

  /** Spread rows so each partition carries ≈ `targetBytes` of payload —
    * binary media skews badly if partitioned by row count alone.
    */
  def repartitionBySize(df: DataFrame, payloadCol: String, targetBytes: Long): DataFrame = {
    val stats = df.select(sum(length(col(payloadCol)))).head()
    val total = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, math.min(100000, (total / math.max(1L, targetBytes)).toInt))
    df.repartition(parts)
  }

  /** Decode + feature-extract images, one decoder context per partition.
    * Output: typed [[ImageFeatures]] rows.
    */
  def imageFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder()
  ): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "image").mapPartitions { rows =>
      // the decoder deserializes once per task; heavyweight native state
      // belongs in its lazy/transient fields (see MediaDecoder contract)
      rows.map { r =>
        val (w, h, c, lumas) = decoder.decodeImage(r.payload)
        val hist = new Array[Long](16)
        var sumLuma = 0.0
        var n = 0L
        lumas.foreach { l =>
          hist(l / 16) += 1
          sumLuma += l
          n += 1
        }
        ImageFeatures(r.media_id, w, h, c, if (n == 0) 0.0 else sumLuma / n, hist)
      }
    }
  }

  /** Decode + feature-extract audio: sample count and RMS level. */
  def audioFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder()
  ): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "audio").mapPartitions { rows =>
      rows.map { r =>
        var sumSq = 0.0
        var n = 0L
        decoder.decodeAudio(r.payload).foreach { s => sumSq += s * s; n += 1 }
        AudioFeatures(r.media_id, r.meta.sampleRateHz, n,
          if (n == 0) 0.0 else math.sqrt(sumSq / n))
      }
    }
  }

  /** Resize images over `maxDim` (aspect preserved); metadata rewritten,
    * payload re-encoded by the decoder. Non-images pass through untouched.
    */
  def resizeImages(
      media: Dataset[MediaRow],
      maxDim: Int,
      decoder: MediaDecoder = StubDecoder()
  ): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.meta.mediaType != "image" || math.max(r.meta.width, r.meta.height) <= maxDim) r
      else {
        val scale = maxDim.toDouble / math.max(r.meta.width, r.meta.height)
        val nw = math.max(1, (r.meta.width * scale).toInt)
        val nh = math.max(1, (r.meta.height * scale).toInt)
        r.copy(
          meta = r.meta.copy(width = nw, height = nh),
          payload = decoder.resizeImage(r.payload, r.meta.width, r.meta.height, nw, nh))
      }
    }
  }

  /** Sample every `everyN`-th frame of each video payload; explode-shaped
    * output with per-video ordered frame indices.
    */
  def sampleFrames(
      media: Dataset[MediaRow],
      everyN: Int,
      decoder: MediaDecoder
  ): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "video").flatMap { r =>
      decoder.videoFrames(r.payload).zipWithIndex.collect {
        case (chunk, idx) if idx % everyN == 0 => VideoFrame(r.media_id, idx, chunk)
      }
    }
  }

  /** [[sampleFrames]] with the stub's fixed-size chunking. */
  def sampleFrames(
      media: Dataset[MediaRow],
      everyN: Int,
      frameBytes: Int = 256
  ): Dataset[VideoFrame] =
    sampleFrames(media, everyN, StubDecoder(frameBytes))
}
