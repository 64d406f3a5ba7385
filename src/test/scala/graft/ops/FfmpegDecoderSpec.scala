package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.dftly.SparkTestBase

/** [[FfmpegMediaDecoder]]: the full shell-out path (temp-file input, arg
  * construction, stdout streaming, exit-code handling, watchdog) driven by
  * a deterministic SHIM binary — a shell script that answers the exact CLI
  * contract with pre-built fixture bytes — so the process plumbing is
  * fully tested in this codec-less sandbox. The closing test runs against
  * a REAL ffmpeg when one is on PATH and skips cleanly otherwise.
  */
class FfmpegDecoderSpec extends SparkTestBase {

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("graft_ffmpeg_shim")
    d.toFile.deleteOnExit()
    d
  }

  private lazy val pngFixture: Array[Byte] =
    graft.SparkEntry.renderTestPng("shim image", 32, 24)
  private lazy val wavFixture: Array[Byte] =
    graft.SparkEntry.renderTestWav("shim audio", halfGain = false)
  private lazy val mjpegFixture: Array[Byte] = {
    def jpeg(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, (x * 16 + y + seed * 37) * 1001 & 0xFFFFFF)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    jpeg(1) ++ jpeg(2)
  }

  /** Write an executable shim named ffmpeg-like that answers the CLI
    * contract from fixture files.
    */
  private def shim(name: String, body: String): String = {
    val p = dir.resolve(name)
    Files.write(p, ("#!/bin/sh\n" + body).getBytes(StandardCharsets.UTF_8))
    p.toFile.setExecutable(true)
    p.toString
  }

  private lazy val goodShim: String = {
    val png = dir.resolve("fix.png"); Files.write(png, pngFixture)
    val wav = dir.resolve("fix.wav"); Files.write(wav, wavFixture)
    val mj = dir.resolve("fix.mjpeg"); Files.write(mj, mjpegFixture)
    shim("ffmpeg",
      s"""case "$$*" in
         |  *-version*) echo "ffmpeg shim"; exit 0;;
         |  *"-c:v mjpeg"*) cat "$mj"; exit 0;;
         |  *"-f wav"*) cat "$wav"; exit 0;;
         |  *"-c:v png"*) cat "$png"; exit 0;;
         |  *) exit 1;;
         |esac
         |""".stripMargin)
  }

  private val payload = "opaque-container-bytes".getBytes(StandardCharsets.UTF_8)

  test("available() probes the binary; false on a missing path") {
    assert(FfmpegMediaDecoder.available(goodShim))
    assert(!FfmpegMediaDecoder.available("/nonexistent/ffmpeg"))
  }

  test("decodeImage: transcode-to-PNG path delegates pixels to the JDK layer") {
    val dec = FfmpegMediaDecoder(goodShim)
    val (w, h, c, lumas) = dec.decodeImage(payload)
    val (jw, jh, jc, jl) = JdkMediaDecoder().decodeImage(pngFixture)
    assert((w, h, c) == (jw, jh, jc))
    assert(lumas.toSeq == jl.toSeq)
  }

  test("decodeAudio: transcode-to-WAV path yields the JDK layer's samples") {
    val dec = FfmpegMediaDecoder(goodShim)
    val got = dec.decodeAudio(payload).toSeq
    val want = JdkMediaDecoder().decodeAudio(wavFixture).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("videoFrames: MJPEG stream splits into decodable JPEG frames") {
    val dec = FfmpegMediaDecoder(goodShim)
    val frames = dec.videoFrames(payload).toSeq
    assert(frames.length == 2)
    frames.foreach { f =>
      assert((f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8)
      val (w, h, _, _) = JdkMediaDecoder().decodeImage(f)
      assert(w == 16 && h == 16)
    }
  }

  test("resizeImage: scaled transcode replaces the payload") {
    val dec = FfmpegMediaDecoder(goodShim)
    val out = dec.resizeImage(payload, 32, 24, 8, 6)
    assert(out.sameElements(pngFixture)) // the shim's answer, not the input
  }

  test("corrupt-payload contract: failing child degrades, never throws") {
    val bad = FfmpegMediaDecoder(shim("ffmpeg_bad", "exit 1\n"))
    val (w, h, c, lumas) = bad.decodeImage(payload)
    assert((w, h, c) == ((0, 0, 0)) && lumas.isEmpty)
    assert(bad.decodeAudio(payload).isEmpty)
    assert(bad.resizeImage(payload, 4, 4, 2, 2).sameElements(payload))
    // video falls back to the fixed-size chunking contract
    val chunks = bad.videoFrames(payload).toSeq
    assert(chunks.map(_.toSeq) == payload.grouped(256).toSeq.map(_.toSeq))
    // a missing binary entirely follows the same contract
    val gone = FfmpegMediaDecoder("/nonexistent/ffmpeg")
    assert(gone.decodeAudio(payload).isEmpty)
  }

  test("watchdog kills a hung child within timeoutSec") {
    val hung = FfmpegMediaDecoder(shim("ffmpeg_hang", "sleep 30\n"),
      timeoutSec = 1) // non-exec shim: sleep is a DESCENDANT — the
                      // watchdog must kill the tree, not just the shell
    val t0 = System.nanoTime()
    assert(hung.decodeAudio(payload).isEmpty)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 10.0, s"watchdog did not fire: $sec s")
  }

  test("against a REAL ffmpeg when present (skipped cleanly otherwise)") {
    assume(FfmpegMediaDecoder.available(), "no ffmpeg on PATH")
    val dec = FfmpegMediaDecoder()
    val (w, h, _, _) = dec.decodeImage(pngFixture)
    assert(w == 32 && h == 24)
    val samples = dec.decodeAudio(wavFixture)
    assert(samples.nonEmpty)
  }
}
