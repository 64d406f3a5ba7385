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

  // ------------------------------------------------------- JdkMediaDecoder

  /** A real encoded image: solid gray(level) w×h, in the given ImageIO
    * format ("png" / "jpg" / "bmp").
    */
  private def encodeImage(w: Int, h: Int, level: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (level << 16) | (level << 8) | level
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  /** A real WAV: `n` mono 16-bit samples, every one exactly `value`
    * (value in [-1,1), representable in 1/32768 steps).
    */
  private def encodeWav(n: Int, value: Double): Array[Byte] = {
    import javax.sound.sampled._
    val s = math.round(value * 32768).toInt
    val data = new Array[Byte](2 * n)
    for (i <- 0 until n) {
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // signed, little-endian
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  private def imgRow(id: Long, payload: Array[Byte], w: Int = 0, h: Int = 0) =
    MediaRow(id, MediaMeta("image", "real", w, h, 0, 0L), payload)

  test("JdkMediaDecoder: real PNG decodes to exact dimensions, luma, and histogram") {
    // gray(100): BT.601 luma = (299+587+114)*100/1000 = exactly 100 → bin 6
    val rows = Seq(imgRow(1L, encodeImage(20, 10, 100, "png"))).toDS()
    val f = Multimodal.imageFeatures(rows, JdkMediaDecoder()).collect().head
    assert(f.width == 20 && f.height == 10 && f.channels == 3)
    assert(f.meanLuma == 100.0)
    assert(f.histogram.sum == 200L && f.histogram(6) == 200L)
  }

  test("JdkMediaDecoder: resizeImages re-encodes real pixels at the new size, format preserved") {
    val rows = Seq(
      imgRow(1L, encodeImage(40, 20, 80, "png"), 40, 20),
      imgRow(2L, encodeImage(32, 32, 200, "jpg"), 32, 32)).toDS()
    val out = Multimodal.resizeImages(rows, maxDim = 10, JdkMediaDecoder())
      .collect().sortBy(_.media_id)
    // metadata rewritten by the operator, payload genuinely re-encoded
    assert(out(0).meta.width == 10 && out(0).meta.height == 5)
    val (w1, h1, _, lumas1) = JdkMediaDecoder().decodeImage(out(0).payload)
    assert(w1 == 10 && h1 == 5)
    assert(lumas1.forall(_ == 80), "bilinear over a solid color stays that color")
    // JPEG stays JPEG (magic FFD8) through the resize
    assert((out(1).payload(0) & 0xFF) == 0xFF && (out(1).payload(1) & 0xFF) == 0xD8)
    val (w2, h2, _, _) = JdkMediaDecoder().decodeImage(out(1).payload)
    assert(w2 == 10 && h2 == 10)
  }

  test("JdkMediaDecoder: real WAV decodes to exact sample count and RMS") {
    val rows = Seq(
      MediaRow(1L, MediaMeta("audio", "wav", 0, 0, 8000, 100L), encodeWav(800, 0.5)))
      .toDS()
    val f = Multimodal.audioFeatures(rows, JdkMediaDecoder()).collect().head
    assert(f.nFrames == 800L)
    assert(f.rms == 0.5, "every sample exactly 0.5 → RMS exactly 0.5")
  }

  test("JdkMediaDecoder: corrupt payloads degrade per contract — q23c invariants hold on zero pixels") {
    val junk = "definitely not a PNG".getBytes("UTF-8")
    val rows = Seq(
      imgRow(1L, junk),
      MediaRow(2L, MediaMeta("audio", "wav", 0, 0, 8000, 0L), junk)).toDS()
    val img = Multimodal.imageFeatures(rows, JdkMediaDecoder()).collect().head
    assert(img.width == 0 && img.height == 0 && img.meanLuma == 0.0)
    assert(img.histogram.sum == 0L, "histogram-total = w×h holds: 0 = 0×0")
    val aud = Multimodal.audioFeatures(rows, JdkMediaDecoder()).collect().head
    assert(aud.nFrames == 0L && aud.rms == 0.0)
    // resize cannot re-encode what it cannot decode: payload passes through
    val rez = Multimodal.resizeImages(
      Seq(imgRow(3L, junk, 100, 100)).toDS(), maxDim = 10, JdkMediaDecoder()).collect().head
    assert(rez.payload.sameElements(junk))
  }

  /** A real animated GIF: one frame per gray level, all w×h. */
  private def encodeAnimatedGif(w: Int, h: Int, levels: Seq[Int]): Array[Byte] = {
    import javax.imageio.ImageIO
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    levels.foreach { lvl =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (lvl << 16) | (lvl << 8) | lvl
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  test("JdkMediaDecoder: animated GIF yields one REAL decoded frame per animation frame") {
    val gif = encodeAnimatedGif(12, 8, Seq(40, 120, 220))
    val frames = JdkMediaDecoder().videoFrames(gif).toSeq
    assert(frames.length == 3)
    // each extracted frame is a standalone decodable image at source dims
    // with the right pixels (GIF's 256-color quantization can shift solid
    // grays slightly — exact levels are checked within the palette step)
    frames.zip(Seq(40, 120, 220)).foreach { case (f, lvl) =>
      val (w, h, _, lumas) = JdkMediaDecoder().decodeImage(f)
      assert(w == 12 && h == 8)
      val ls = lumas.toSeq
      assert(ls.size == 96)
      assert(ls.distinct.size == 1, "solid frame stays solid")
      assert(math.abs(ls.head - lvl) <= 8, s"luma ${ls.head} far from $lvl")
    }
  }

  test("JdkMediaDecoder: MJPEG splits into per-frame JPEGs; unknown containers chunk") {
    val j1 = encodeImage(16, 8, 60, "jpg")
    val j2 = encodeImage(16, 8, 180, "jpg")
    val frames = JdkMediaDecoder().videoFrames(j1 ++ j2).toSeq
    assert(frames.length == 2)
    assert(frames(0).sameElements(j1) && frames(1).sameElements(j2))
    val (w, h, _, _) = JdkMediaDecoder().decodeImage(frames(1))
    assert(w == 16 && h == 8)
    // non-GIF/JPEG payload falls back to the documented chunking path
    val junk = Array.tabulate[Byte](100)(_.toByte)
    assert(JdkMediaDecoder(frameBytes = 32).videoFrames(junk).length == 4)
    // corrupt GIF header yields no frames, not an exception
    assert(JdkMediaDecoder().videoFrames("GIF8garbage".getBytes("UTF-8")).isEmpty)
  }

  test("sampleFrames over real animated GIFs end-to-end") {
    val gif = encodeAnimatedGif(10, 10, Seq(30, 90, 150, 210))
    val media = Seq(
      MediaRow(1L, MediaMeta("video", "gif", 10, 10, 0, 400L), gif)).toDS()
    val frames = Multimodal.sampleFrames(media, everyN = 2, JdkMediaDecoder()).collect()
    assert(frames.map(_.frameIndex).sorted.sameElements(Array(0, 2)))
    frames.foreach { f =>
      val (w, h, _, _) = JdkMediaDecoder().decodeImage(f.payload)
      assert(w == 10 && h == 10)
    }
  }

  test("pHash: deterministic, identity-stable, degenerate-safe") {
    val png = graft.SparkEntry.renderTestPng("some document text", 64, 48)
    val dec = JdkMediaDecoder()
    def hashOf(p: Array[Byte]): Option[Long] = {
      val (w, h, _, lumas) = dec.decodeImage(p)
      PHash.phash64(w, h, lumas)
    }
    val h1 = hashOf(png)
    val h2 = hashOf(png)
    assert(h1.isDefined && h1 == h2)
    // identical pixels, different container bytes: re-encode the same
    // raster as BMP — the hash is a function of pixels, not bytes
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val hBmp = hashOf(bos.toByteArray)
    assert(hBmp == h1, "re-encoded identical pixels must hash identically")
    // corrupt payload decodes to (0,0) -> None, never a zero sentinel
    assert(hashOf(Array[Byte](1, 2, 3)).isEmpty)
    // a different image is far away (sanity: the hash is not constant)
    val other = hashOf(graft.SparkEntry.renderTestPng("completely different words", 64, 48))
    assert(other.isDefined && PHash.hamming(h1.get, other.get) > 0)
  }

  test("pHash: 2x smooth resize lands within the near-dup band") {
    val dec = JdkMediaDecoder()
    def smoothPng(w: Int, h: Int): Array[Byte] = {
      // a continuous signal sampled at two densities — the resize-variant
      // model: same underlying picture, different raster size
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val fx = x.toDouble / w
        val fy = y.toDouble / h
        val g = ((math.sin(fx * 7) * math.cos(fy * 5) + 1) * 120).toInt.min(255)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def hashOf(p: Array[Byte]): Long = {
      val (w, h, _, lumas) = dec.decodeImage(p)
      PHash.phash64(w, h, lumas).get
    }
    val small = hashOf(smoothPng(64, 48))
    val big = hashOf(smoothPng(128, 96))
    assert(PHash.hamming(small, big) <= 10,
      s"2x resample drifted ${PHash.hamming(small, big)} bits")
  }

  test("imageNearDuplicatePairs finds every planted identical pair; corrupt images pair with nothing") {
    val texts = Seq("alpha body", "beta body", "gamma body", "delta body")
    val rows = texts.zipWithIndex.flatMap { case (t, i) =>
      val p = graft.SparkEntry.renderTestPng(t, 48, 32)
      Seq(
        MediaRow(i.toLong, MediaMeta("image", "png", 48, 32, 0, 0L), p),
        MediaRow(100L + i, MediaMeta("image", "png", 48, 32, 0, 0L), p))
    } :+ MediaRow(999L, MediaMeta("image", "png", 48, 32, 0, 0L), Array[Byte](9, 9)) :+
      MediaRow(998L, MediaMeta("image", "png", 48, 32, 0, 0L), Array[Byte](8))
    val ds = spark.createDataset(rows)
    val pairs = Multimodal.imageNearDuplicatePairs(ds, JdkMediaDecoder())
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    texts.indices.foreach { i =>
      assert(pairs.exists(p => p._1 == i && p._2 == 100L + i && p._3 == 0),
        s"planted identical pair $i missing")
    }
    // the two undecodable payloads must not bucket together via a sentinel
    assert(!pairs.exists(p => p._1 == 998L || p._2 == 998L || p._1 == 999L || p._2 == 999L))
  }

  test("audioFingerprint64: gain-invariant, deterministic, degenerate-safe") {
    val dec = JdkMediaDecoder()
    def fp(w: Array[Byte]): Option[Long] =
      Multimodal.audioFingerprint64(dec.decodeAudio(w))
    val full = fp(graft.SparkEntry.renderTestWav("a test document", halfGain = false))
    val half = fp(graft.SparkEntry.renderTestWav("a test document", halfGain = true))
    assert(full.isDefined && full == half, "exact half gain must not move the contour")
    val other = fp(graft.SparkEntry.renderTestWav("different sound entirely", halfGain = false))
    assert(other.isDefined && other != full)
    // fewer samples than windows -> None
    assert(Multimodal.audioFingerprint64(Iterator.fill(10)(0.5)).isEmpty)
    assert(Multimodal.audioFingerprint64(Iterator.empty).isEmpty)
  }

  test("audioFingerprint64: collapse path (clips past the block cap) keeps identity + gain invariance") {
    // 200k samples > the 65536 buffer cap -> blockSize doubles twice;
    // deterministic signal, half-gain copy must still match exactly
    def sig(gain: Double): Option[Long] =
      Multimodal.audioFingerprint64(
        Iterator.tabulate(200000)(i => gain * math.sin(i * 0.01) * (1 + (i % 97) / 97.0)))
    val full = sig(1.0)
    val half = sig(0.5) // power-of-two gain: energies scale exactly
    assert(full.isDefined && full == sig(1.0), "deterministic on the collapse path")
    assert(full == half, "gain invariance must survive block collapsing")
    val other = Multimodal.audioFingerprint64(
      Iterator.tabulate(200000)(i => math.cos(i * 0.003)))
    assert(other.isDefined && other != full)
  }

  test("videoSignature64: identical frames identical sig; majority stable under frame resampling") {
    val dec = JdkMediaDecoder()
    val mj = graft.SparkEntry.renderTestMjpeg("video content here")
    def sig(p: Array[Byte]): Option[Long] =
      Multimodal.videoSignature64(dec.videoFrames(p), dec)
    val s1 = sig(mj)
    assert(s1.isDefined && sig(mj) == s1)
    // duplicating every frame (2x frame rate) keeps the majority bits
    val frames = dec.videoFrames(mj).toSeq
    val doubled = Multimodal.videoSignature64(
      frames.flatMap(f => Seq(f, f)).iterator, dec)
    assert(doubled == s1, "2x frame duplication must not move majority bits")
    // no decodable frames -> None
    assert(Multimodal.videoSignature64(Iterator(Array[Byte](1, 2, 3)), dec).isEmpty)
    assert(Multimodal.videoSignature64(Iterator.empty, dec).isEmpty)
  }

  test("audio/video near-dup pairs find planted identical and gain-scaled duplicates") {
    val texts = Seq("clip one", "clip two")
    val audioRows = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        MediaRow(i.toLong, MediaMeta("audio", "wav", 0, 0, 8000, 0L),
          graft.SparkEntry.renderTestWav(t, halfGain = false)),
        MediaRow(100L + i, MediaMeta("audio", "wav", 0, 0, 8000, 0L),
          graft.SparkEntry.renderTestWav(t, halfGain = true)))
    }
    val aPairs = Multimodal.audioNearDuplicatePairs(
        spark.createDataset(audioRows), JdkMediaDecoder())
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    texts.indices.foreach { i =>
      assert(aPairs.exists(p => p._1 == i && p._2 == 100L + i && p._3 == 0),
        s"gain-scaled audio pair $i missing")
    }
    val videoRows = texts.zipWithIndex.flatMap { case (t, i) =>
      val p = graft.SparkEntry.renderTestMjpeg(t)
      Seq(
        MediaRow(i.toLong, MediaMeta("video", "mjpeg", 48, 32, 0, 0L), p),
        MediaRow(100L + i, MediaMeta("video", "mjpeg", 48, 32, 0, 0L), p))
    }
    val vPairs = Multimodal.videoNearDuplicatePairs(
        spark.createDataset(videoRows), JdkMediaDecoder())
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect().toSet
    texts.indices.foreach { i =>
      assert(vPairs.exists(p => p._1 == i && p._2 == 100L + i && p._3 == 0),
        s"identical video pair $i missing")
    }
  }

  test("dropNearDuplicateImages keeps the first copy, drops later ones, passes non-images through") {
    val p = graft.SparkEntry.renderTestPng("dupe me", 48, 32)
    val rows = Seq(
      MediaRow(1L, MediaMeta("image", "png", 48, 32, 0, 0L), p),
      MediaRow(2L, MediaMeta("image", "png", 48, 32, 0, 0L), p),
      MediaRow(3L, MediaMeta("image", "png", 48, 32, 0, 0L),
        graft.SparkEntry.renderTestPng("unique", 48, 32)),
      MediaRow(4L, MediaMeta("audio", "wav", 0, 0, 8000, 0L),
        graft.SparkEntry.renderTestWav("sound", halfGain = false)))
    val kept = Multimodal.dropNearDuplicateImages(
        spark.createDataset(rows), JdkMediaDecoder())
      .map(_.media_id).collect().toSet
    assert(kept == Set(1L, 3L, 4L)) // 2 dropped (later copy); audio row untouched
  }

  test("both decoders run through the same operators on the same rows") {
    val rows = Seq(imgRow(1L, encodeImage(16, 16, 50, "png"))).toDS()
    val real = Multimodal.imageFeatures(rows, JdkMediaDecoder()).collect().head
    val stub = Multimodal.imageFeatures(rows, StubDecoder()).collect().head
    // identical schema and invariants, decoder-specific values
    assert(real.width == 16 && real.height == 16)
    assert(stub.width >= 16 && stub.width <= 79 && stub.height >= 16 && stub.height <= 79)
    assert(real.histogram.sum == real.width.toLong * real.height)
    assert(stub.histogram.sum == stub.width.toLong * stub.height)
  }
}
