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

/** Multimodal column operators: decode, feature-extract, resize, frame-sample.
  *
  * The *decode* step is a clearly-marked deterministic STUB (no image/audio
  * codecs in this environment); everything Spark-side is real and load-bearing:
  * typed schemas via case-class Encoders, per-partition batch processing with
  * one decoder context per partition (`mapPartitions` — the Scala analogue of
  * `mapInPandas` batching), and size-aware repartitioning so big payloads
  * don't skew executors.
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

  // ---------------------------------------------------------------------
  // STUB decoders. A real deployment replaces the bodies with libjpeg /
  // libsndfile / ffmpeg calls; signatures, batching and schemas are final.
  // The fakes are pure functions of the payload bytes → deterministic,
  // testable end-to-end.
  // ---------------------------------------------------------------------

  /** STUB: pretend-decode an image payload to (width, height, channels,
    * pixel-luma iterator). Deterministic fake derived from the bytes.
    */
  private[ops] def stubDecodeImage(payload: Array[Byte]): (Int, Int, Int, Iterator[Int]) = {
    val w = 16 + (math.abs(java.util.Arrays.hashCode(payload)) % 64)
    val h = 16 + (math.abs(java.util.Arrays.hashCode(payload) / 64) % 64)
    val lumas = Iterator.tabulate(w * h) { i =>
      java.lang.Byte.toUnsignedInt(payload(i % math.max(1, payload.length)))
    }
    (w, h, 3, lumas)
  }

  /** STUB: pretend-decode audio to PCM samples in [-1, 1]. */
  private[ops] def stubDecodeAudio(payload: Array[Byte]): Iterator[Double] =
    payload.iterator.map(b => b.toDouble / 128.0)

  /** Decode + feature-extract images, one decoder context per partition.
    * Output: typed [[ImageFeatures]] rows.
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "image").mapPartitions { rows =>
      // one (stub) decoder init per partition — amortized like mapInPandas
      rows.map { r =>
        val (w, h, c, lumas) = stubDecodeImage(r.payload)
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
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "audio").mapPartitions { rows =>
      rows.map { r =>
        var sumSq = 0.0
        var n = 0L
        stubDecodeAudio(r.payload).foreach { s => sumSq += s * s; n += 1 }
        AudioFeatures(r.media_id, r.meta.sampleRateHz, n,
          if (n == 0) 0.0 else math.sqrt(sumSq / n))
      }
    }
  }

  /** STUB resize: keeps the byte payload opaque, rewrites the metadata the
    * way a real resizer would; payload transform is a marked fake.
    */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.meta.mediaType != "image" || math.max(r.meta.width, r.meta.height) <= maxDim) r
      else {
        val scale = maxDim.toDouble / math.max(r.meta.width, r.meta.height)
        val nw = math.max(1, (r.meta.width * scale).toInt)
        val nh = math.max(1, (r.meta.height * scale).toInt)
        // STUB: real implementation re-encodes pixels; fake truncates bytes
        // proportionally so downstream size accounting stays realistic.
        val newLen = math.max(1, (r.payload.length * scale * scale).toInt)
        r.copy(
          meta = r.meta.copy(width = nw, height = nh),
          payload = r.payload.take(newLen))
      }
    }
  }

  /** Sample every `everyN`-th frame of each video payload. Frame boundaries
    * are a STUB (fixed-size chunks standing in for codec frame parsing); the
    * explode-shaped output and ordering contract are real.
    */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int, frameBytes: Int = 256): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.mediaType == "video").flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % everyN == 0 => VideoFrame(r.media_id, idx, chunk)
      }
    }
  }
}
