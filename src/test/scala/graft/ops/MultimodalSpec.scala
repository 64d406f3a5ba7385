package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dftly.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  /** Deterministic synthetic media built from the documents table's text
    * bytes — binary payloads with typed metadata, as a media lake would hold.
    */
  private lazy val media: Dataset[MediaRow] = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(60).select($"doc_id", $"text").as[(Long, String)].map { case (id, text) =>
      val kind = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val payload = text.getBytes("UTF-8")
      MediaRow(id,
        MediaMeta(kind, "stub",
          width = if (kind == "image") 100 else 0,
          height = if (kind == "image") 80 else 0,
          sampleRateHz = if (kind == "audio") 16000 else 0,
          durationMs = if (kind == "image") 0L else 1000L),
        payload)
    }.cache()
  }

  test("media dataset round-trips through parquet with binary + struct schema") {
    val path = java.nio.file.Files.createTempDirectory("media").toString
    media.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    val schema = back.schema
    assert(schema("payload").dataType == BinaryType)
    assert(schema("meta").dataType.isInstanceOf[StructType])
    assert(back.count() == media.count())
    val typed = back.as[MediaRow]
    assert(typed.filter(_.meta.mediaType == "image").count() == media.filter(_.meta.mediaType == "image").count())
  }

  test("imageFeatures: typed output, deterministic, only images") {
    val feats = Multimodal.imageFeatures(media)
    val rows = feats.collect()
    assert(rows.nonEmpty)
    assert(rows.length == media.filter(_.meta.mediaType == "image").count())
    rows.foreach { f =>
      assert(f.width >= 16 && f.height >= 16 && f.channels == 3)
      assert(f.histogram.length == 16)
      assert(f.histogram.sum == f.width.toLong * f.height)
      assert(f.meanLuma >= 0 && f.meanLuma <= 255)
    }
    // deterministic across runs
    val again = Multimodal.imageFeatures(media).collect()
    assert(rows.sortBy(_.media_id).map(_.meanLuma).toSeq ==
      again.sortBy(_.media_id).map(_.meanLuma).toSeq)
  }

  test("audioFeatures: rms in [0,1], frame count == payload bytes") {
    val feats = Multimodal.audioFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.rms >= 0.0 && f.rms <= 1.0)
      assert(f.sampleRateHz == 16000)
      assert(f.nFrames > 0)
    }
  }

  test("resizeImages rewrites metadata and shrinks payloads; non-images untouched") {
    val resized = Multimodal.resizeImages(media, maxDim = 50).collect()
    val orig = media.collect().map(r => r.media_id -> r).toMap
    resized.foreach { r =>
      if (r.meta.mediaType == "image") {
        assert(math.max(r.meta.width, r.meta.height) <= 50)
        assert(r.payload.length <= orig(r.media_id).payload.length)
      } else {
        assert(r.payload.sameElements(orig(r.media_id).payload))
      }
    }
  }

  test("sampleFrames: every Nth fixed-size chunk, ordered frame indices") {
    val frames = Multimodal.sampleFrames(media, everyN = 2, frameBytes = 64).collect()
    assert(frames.nonEmpty)
    frames.foreach { f => assert(f.frameIndex % 2 == 0) }
    val byId = frames.groupBy(_.media_id)
    val vids = media.filter(_.meta.mediaType == "video").collect()
    vids.foreach { v =>
      val expect = (0 until (v.payload.length + 63) / 64).count(_ % 2 == 0)
      assert(byId(v.media_id).length == expect)
    }
  }

  test("repartitionBySize bounds payload bytes per partition") {
    val df = media.toDF()
    val parts = Multimodal.repartitionBySize(df, "payload", targetBytes = 4096)
    assert(parts.rdd.getNumPartitions >= 2)
  }

  test("binaryFile source reads raw files with path/length/content schema") {
    val dir = java.nio.file.Files.createTempDirectory("binsrc")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.bin"), Array[Byte](4, 5))
    val df = Multimodal.readBinaryDir(spark, dir.toString, "*.bin")
    val rows = df.select("path", "length").collect()
    assert(rows.length == 2)
    assert(df.schema("content").dataType == BinaryType)
  }

  test("zero-byte image payloads decode to all-black instead of killing the task") {
    val m = Seq(MediaRow(7L, MediaMeta("image", "stub", 10, 10, 0, 0L), Array.empty[Byte]))
      .toDS()
    val f = Multimodal.imageFeatures(m).collect()
    assert(f.length == 1 && f.head.meanLuma == 0.0 && f.head.histogram(0) > 0)
  }

  test("a custom MediaDecoder plugs in without touching the operators") {
    // a fixed-everything decoder: proves the operators call through the
    // trait (and that a real libjpeg/ffmpeg impl only needs this surface)
    object FixedDecoder extends MediaDecoder {
      def decodeImage(p: Array[Byte]) = (8, 4, 1, Iterator.fill(32)(160))
      def decodeAudio(p: Array[Byte]) = Iterator.fill(10)(0.5)
      def resizeImage(p: Array[Byte], w: Int, h: Int, nw: Int, nh: Int) =
        Array[Byte](9, 9)
      def videoFrames(p: Array[Byte]) = Iterator(p)
    }
    val img = Multimodal.imageFeatures(media, FixedDecoder).collect()
    assert(img.nonEmpty && img.forall(f =>
      f.width == 8 && f.height == 4 && f.channels == 1 && f.meanLuma == 160.0
        && f.histogram(10) == 32))
    val aud = Multimodal.audioFeatures(media, FixedDecoder).collect()
    assert(aud.nonEmpty && aud.forall(f => f.nFrames == 10 && f.rms == 0.5))
    val rez = Multimodal.resizeImages(media, maxDim = 10, FixedDecoder)
      .filter(_.meta.mediaType == "image").collect()
    assert(rez.forall(r => r.payload.sameElements(Array[Byte](9, 9))))
    val frames = Multimodal.sampleFrames(media, everyN = 1, FixedDecoder).collect()
    val vids = media.filter(_.meta.mediaType == "video").count()
    assert(frames.length == vids && frames.forall(_.frameIndex == 0))
  }
}
