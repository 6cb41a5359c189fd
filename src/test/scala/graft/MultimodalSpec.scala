package graft

import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import java.awt.image.BufferedImage
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Real image decode over real PNG/JPEG bytes (javax.imageio), plus the
  * governed fallbacks: truncated images and non-image payloads take the
  * deterministic stub path instead of failing the batch.
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def mediaDF(rows: (Long, String, Array[Byte])*) =
    rows.toDF("id", "modality", "data")

  /** Horizontal greyscale step gradient: pixel (x, y) = grey x*30. */
  private def gradientPng(w: Int, h: Int): Array[Byte] = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = x * 30
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(im, "png", out)
    out.toByteArray
  }

  test("PNG roundtrip: real dims, 1 frame, exact mean-luma grid") {
    // 8x2 gradient: grid cols of 2 px each, grey value x*30 -> luma = value
    // (grey luma is exact: (299+587+114)v / 1000 = v). Cell means 15/75/135/195.
    val out = Multimodal.decode(mediaDF((7L, "image", gradientPng(8, 2))))
      .collect().head
    assert(out.getAs[Int]("width") == 8 && out.getAs[Int]("height") == 2)
    assert(out.getAs[Int]("n_frames") == 1)
    val f = out.getSeq[Float](out.fieldIndex("features"))
    val expect = Seq(15, 75, 135, 195).map(v => (v / 255.0).toFloat)
    assert(f == expect ++ expect, s"grid means off: $f")
  }

  test("stripe PNG: decoded features equal the stripe values in closed form") {
    val bytes = Multimodal.stripePng(8, 4, Seq(10, 20, 128, 255))
    val out = Multimodal.decode(mediaDF((9L, "image", bytes))).collect().head
    assert(out.getAs[Int]("width") == 8 && out.getAs[Int]("height") == 4)
    val f = out.getSeq[Float](out.fieldIndex("features"))
    val expect = Seq(10, 20, 128, 255).map(v => (v / 255.0).toFloat)
    assert(f == expect ++ expect, s"stripe features off: $f")
  }

  test("solid PNG: every grid cell carries the fill's luma") {
    val bytes = Multimodal.solidPng(20, 10, 200, 100, 50)
    val out = Multimodal.decode(mediaDF((1L, "image", bytes))).collect().head
    assert(out.getAs[Int]("width") == 20 && out.getAs[Int]("height") == 10)
    val luma = (299 * 200 + 587 * 100 + 114 * 50) / 1000
    val f = out.getSeq[Float](out.fieldIndex("features"))
    assert(f.forall(_ == (luma / 255.0).toFloat), s"expected all $luma: $f")
  }

  test("JPEG: exact dims; solid-fill luma within lossy tolerance") {
    val im = new BufferedImage(33, 17, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 17; x <- 0 until 33) im.setRGB(x, y, 0x806040)
    val jout = new ByteArrayOutputStream()
    assert(ImageIO.write(im, "jpg", jout), "JDK jpeg writer available")
    val out = Multimodal.decode(mediaDF((2L, "image", jout.toByteArray)))
      .collect().head
    assert(out.getAs[Int]("width") == 33 && out.getAs[Int]("height") == 17)
    val luma = (299 * 0x80 + 587 * 0x60 + 114 * 0x40) / 1000 / 255.0
    val f = out.getSeq[Float](out.fieldIndex("features"))
    assert(f.forall(v => math.abs(v - luma) < 0.02), s"jpeg luma drifted: $f")
  }

  test("resizePixels: box-average downscale is exact on a gradient") {
    // 8x2 gradient (grey x*30) -> 4x1: each out pixel averages a 2x2 box
    // of greys {v, v+30} twice -> v+15. Decode of the re-encoded PNG must
    // see [15, 75, 135, 195] in the first grid row (second row empty -> 0).
    val out = Multimodal.resizePixels(
      mediaDF((5L, "image", gradientPng(8, 2))), maxDim = 4).collect().head
    assert((out.getAs[Int]("width"), out.getAs[Int]("height")) == (8, 2))
    assert((out.getAs[Int]("out_w"), out.getAs[Int]("out_h")) == (4, 1))
    assert(out.getAs[Boolean]("resized"))
    val dec = Multimodal.decode(mediaDF(
      (5L, "image", out.getAs[Array[Byte]]("data")))).collect().head
    assert((dec.getAs[Int]("width"), dec.getAs[Int]("height")) == (4, 1))
    val f = dec.getSeq[Float](dec.fieldIndex("features"))
    val expect = Seq(15, 75, 135, 195).map(v => (v / 255.0).toFloat) ++
      Seq(0f, 0f, 0f, 0f)
    assert(f == expect, s"resampled grid off: $f")
  }

  test("resizePixels: within-bounds and non-image payloads pass through") {
    val small = Multimodal.solidPng(10, 6, 1, 2, 3)
    val rows = Multimodal.resizePixels(mediaDF(
      (1L, "image", small),
      (2L, "audio", "not an image".getBytes("UTF-8"))), maxDim = 64)
      .collect().sortBy(_.getLong(0))
    assert(!rows(0).getAs[Boolean]("resized") &&
      rows(0).getAs[Array[Byte]]("data").sameElements(small))
    assert(rows(1).getAs[Int]("width") == -1, "non-image marked undecoded")
    assert(rows(1).getAs[Array[Byte]]("data")
      .sameElements("not an image".getBytes("UTF-8")))
  }

  test("WAV decode: real rate/channels/frames; RMS windows recover amplitude") {
    val bytes = Multimodal.squareWav(n = 800, rate = 16000, amplitude = 12345)
    val out = Multimodal.decode(mediaDF((9L, "audio", bytes))).collect().head
    assert(out.getAs[Int]("width") == 16000, "width carries sample rate")
    assert(out.getAs[Int]("height") == 1, "height carries channels")
    assert(out.getAs[Int]("n_frames") == 800)
    val f = out.getSeq[Float](out.fieldIndex("features"))
    assert(f.forall(v => math.round(v * 32768) == 12345L),
      s"square-wave RMS must equal the amplitude exactly: $f")
  }

  test("WAV decode covers the PCM family: 8/24/32-bit, float32/64, RIFX") {
    // each fixture's square-wave RMS must recover its amplitude exactly
    // in that format's normalized units
    val cases: Seq[(String, Array[Byte], Double)] = Seq(
      ("pcm8", Multimodal.squareWavFmt(400, 8000, 100, 8, floatPcm = false), 100 / 128.0),
      ("pcm24", Multimodal.squareWavFmt(400, 8000, 1234567, 24, floatPcm = false), 1234567 / 8388608.0),
      ("pcm32", Multimodal.squareWavFmt(400, 8000, 123456789, 32, floatPcm = false), 123456789 / 2147483648.0),
      ("f32", Multimodal.squareWavFmt(400, 8000, 0.25, 32, floatPcm = true), 0.25),
      ("f64", Multimodal.squareWavFmt(400, 8000, 0.375, 64, floatPcm = true), 0.375),
      ("rifx16", Multimodal.squareWavFmt(400, 8000, 12345, 16, floatPcm = false, bigEndian = true), 12345 / 32768.0),
      ("rifx24", Multimodal.squareWavFmt(400, 8000, 7654321, 24, floatPcm = false, bigEndian = true), 7654321 / 8388608.0))
    cases.zipWithIndex.foreach { case ((name, bytes, expect), i) =>
      val out = Multimodal.decode(mediaDF((100L + i, "audio", bytes))).collect().head
      assert(out.getAs[Int]("width") == 8000, s"$name rate")
      assert(out.getAs[Int]("n_frames") == 400, s"$name frames")
      val f = out.getSeq[Float](out.fieldIndex("features"))
      assert(f.forall(v => math.abs(v - expect) < 1e-6),
        s"$name RMS must recover amplitude $expect: $f")
    }
  }

  test("truncated WAV falls back to the stub instead of failing the batch") {
    val broken = Multimodal.squareWav(100, 8000, 5).take(30) // RIFF magic intact
    val out = Multimodal.decode(mediaDF((8L, "audio", broken))).collect().head
    assert(out.getAs[Long]("byte_len") == 30L)
    assert(out.getAs[Int]("width") == (32 + 30 % 608), "stub semantics")
  }

  test("AVI decode: real frame count and first-frame pixels; JPEG frames work") {
    // PNG frames: exact luma roundtrip
    val pngFrames = Seq.tabulate(3)(_ => Multimodal.solidPng(10, 8, 30, 60, 90))
    val out = Multimodal.decode(
      mediaDF((11L, "video", Multimodal.mjpegAvi(pngFrames)))).collect().head
    assert((out.getAs[Int]("width"), out.getAs[Int]("height")) == (10, 8))
    assert(out.getAs[Int]("n_frames") == 3, "frame count from real chunk walk")
    val luma = (299 * 30 + 587 * 60 + 114 * 90) / 1000
    val f = out.getSeq[Float](out.fieldIndex("features"))
    assert(f.forall(_ == (luma / 255.0).toFloat))
    // true-to-name MJPEG: JPEG frames decode too (lossy, dims exact)
    val im = new BufferedImage(20, 14, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 14; x <- 0 until 20) im.setRGB(x, y, 0x405060)
    val jb = new ByteArrayOutputStream(); ImageIO.write(im, "jpg", jb)
    val jout = Multimodal.decode(
      mediaDF((12L, "video", Multimodal.mjpegAvi(Seq(jb.toByteArray, jb.toByteArray)))))
      .collect().head
    assert((jout.getAs[Int]("width"), jout.getAs[Int]("height")) == (20, 14))
    assert(jout.getAs[Int]("n_frames") == 2)
  }

  test("non-MJPEG AVI falls back to the stub (no JDK codec for compressed video)") {
    // a video chunk that is NOT ImageIO-decodable (fake H.264-ish bytes)
    val junk = Array.fill[Byte](64)(0x42)
    val out = Multimodal.decode(
      mediaDF((13L, "video", Multimodal.mjpegAvi(Seq(junk))))).collect().head
    // stub semantics: dims derived from byte length
    val len = out.getAs[Long]("byte_len")
    assert(out.getAs[Int]("width") == (32 + len % 608).toInt)
  }

  test("truncated PNG falls back to the stub instead of failing the batch") {
    val broken = Multimodal.solidPng(16, 16, 1, 2, 3).take(20) // magic intact, body gone
    val out = Multimodal.decode(mediaDF((3L, "image", broken))).collect().head
    // stub semantics: dims derived from byte length, not pixels
    assert(out.getAs[Long]("byte_len") == 20L)
    assert(out.getAs[Int]("width") == (32 + 20 % 608))
    assert(out.getAs[Int]("n_frames") == (1 + 20 % 16))
  }

  test("non-image payloads keep the deterministic stub contract") {
    val data = "not an image at all".getBytes("UTF-8")
    val out = Multimodal.decode(mediaDF((4L, "audio", data))).collect().head
    val len = data.length
    assert(out.getAs[Int]("width") == (32 + len % 608))
    assert(out.getAs[Int]("height") == (32 + (len * 7) % 448))
    assert(out.getAs[Int]("n_frames") == (1 + len % 16))
  }
}
