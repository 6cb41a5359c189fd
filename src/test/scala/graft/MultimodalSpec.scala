package graft

import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import java.awt.image.BufferedImage
import org.apache.spark.sql.functions._
import graft.multimodal.{Flac, Multimodal}

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

  test("GIF and BMP decode: exact dims and solid-fill luma; animated GIF frame count") {
    for (fmt <- Seq("gif", "bmp", "tiff")) {
      val bytes = Multimodal.solidImage(10, 6, 30, 60, 90, fmt)
      val out = Multimodal.decode(mediaDF((70L, "image", bytes))).collect().head
      assert(out.getAs[Int]("width") == 10 && out.getAs[Int]("height") == 6, fmt)
      assert(out.getAs[Int]("n_frames") == 1, fmt)
      val luma = (299 * 30 + 587 * 60 + 114 * 90) / 1000
      val f = out.getSeq[Float](out.fieldIndex("features"))
      assert(f.forall(v => math.abs(v - luma / 255.0) < 1e-6),
        s"$fmt solid luma $luma: $f")
    }
    val anim = Multimodal.animatedGif(8, 8,
      Seq((200, 10, 10), (10, 200, 10), (10, 10, 200)))
    val out = Multimodal.decode(mediaDF((71L, "image", anim))).collect().head
    assert(out.getAs[Int]("n_frames") == 3, "animated GIF frame count")
    assert(out.getAs[Int]("width") == 8)
    // first-frame luma: GIF palette of a solid fill is exact
    val luma = (299 * 200 + 587 * 10 + 114 * 10) / 1000
    val f = out.getSeq[Float](out.fieldIndex("features"))
    assert(f.forall(v => math.abs(v - luma / 255.0) < 1e-6), s"first frame: $f")
  }

  test("truncated animated GIF degrades governed: decode survives, frames bounded") {
    // first frame decodes; the full-frame walk sees a stream that ends
    // mid-frame. Whether the JDK counts the complete frames (observed: 2)
    // or throws (the IIOException case the try/catch guards), the decode
    // must NOT fail the batch and must keep the real first-frame dims.
    val anim = Multimodal.animatedGif(8, 8,
      Seq((200, 10, 10), (10, 200, 10), (10, 10, 200)))
    val cut = anim.take(anim.length - 30) // clip inside the last frames
    val out = Multimodal.decode(mediaDF((72L, "image", cut))).collect().head
    assert(out.getAs[Int]("width") == 8 && out.getAs[Int]("height") == 8)
    val nf = out.getAs[Int]("n_frames")
    assert(nf >= 1 && nf < 3, s"truncated 3-frame GIF reported $nf frames")
  }

  /** Decode a G.711 WAV through the JDK's OWN converter — an independent
    * implementation of the same ITU-T tables — and return the linear
    * samples, as the oracle for the expand tables.
    */
  private def javaxG711(wav: Array[Byte]): Array[Short] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val src = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val pcm = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getFormat.getSampleRate, 16, 1,
        2, src.getFormat.getSampleRate, false), src)
    val bytes = pcm.readAllBytes()
    Array.tabulate(bytes.length / 2)(i =>
      (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort)
  }

  test("G.711 expand tables match the JDK's converter on all 256 codes") {
    // one WAV per law whose data is every codeword 0..255 in order
    for (law <- Seq(6, 7)) {
      val table = if (law == 7) Multimodal.UlawTable else Multimodal.AlawTable
      val buf = java.nio.ByteBuffer.allocate(44 + 256)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 256)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(law.toShort).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8)
        .put("data".getBytes("US-ASCII")).putInt(256)
      (0 until 256).foreach(b => buf.put(b.toByte))
      val expect = javaxG711(buf.array())
      assert(expect.length == 256, s"law $law: converter frame count")
      val diffs = (0 until 256).filter(b => table(b) != expect(b))
        .map(b => s"$b: got ${table(b)} want ${expect(b)}")
      assert(diffs.isEmpty, s"law $law mismatches: ${diffs.take(5)}")
    }
  }

  test("G.711 WAV decode: companded square wave recovers its decode exactly") {
    for ((law, code) <- Seq((7, 0x23), (6, 0x6a))) {
      val table = if (law == 7) Multimodal.UlawTable else Multimodal.AlawTable
      val amp = math.abs(table(code).toInt)
      val bytes = Multimodal.g711Wav(n = 480, rate = 8000, law = law, codeword = code)
      val out = Multimodal.decode(mediaDF((40L + law, "audio", bytes))).collect().head
      assert(out.getAs[Int]("width") == 8000 && out.getAs[Int]("height") == 1)
      assert(out.getAs[Int]("n_frames") == 480)
      val f = out.getSeq[Float](out.fieldIndex("features"))
      assert(f.forall(v => math.round(v * 32768.0) == amp.toLong),
        s"law $law code $code: RMS must equal |decode| = $amp exactly: $f")
    }
  }

  test("IMA ADPCM decode: hand-computed nibble sequence") {
    // mono, blockAlign 8 -> 9 samples/block; header predictor 100, step
    // index 8 (step 16); nibbles [3, 15, 0, 8, 0, 0, 0, 0].
    // Hand-decoded per the IMA shift-add rule:
    //  3 (bits 0,1):   diff 2+4+8 = 14  -> 114, idx 8-1 = 7  (step 14)
    //  15 (0,1,2,sign): diff 1+3+7+14=25 ->  89, idx 7+8 = 15 (step 31)
    //  0:              diff 3           ->  92, idx 14       (step 28)
    //  8 (sign):       diff 3           ->  89, idx 13       (step 25)
    //  0,0,0,0:        +3 +2 +2 +2      -> 92, 94, 96, 98
    val samples = Seq(100, 114, 89, 92, 89, 92, 94, 96, 98)
    val buf = java.nio.ByteBuffer.allocate(48 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(40 + 8)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(1).putInt(8000).putInt(8000 * 8 / 9)
      .putShort(8).putShort(4).putShort(2).putShort(9)
      .put("data".getBytes("US-ASCII")).putInt(8)
      .putShort(100).put(8.toByte).put(0.toByte) // header: pred 100, idx 8
      .put(0xf3.toByte).put(0x80.toByte) // nibbles 3,15 then 0,8 (low first)
      .put(0.toByte).put(0.toByte)
    val out = Multimodal.decode(mediaDF((60L, "audio", buf.array()))).collect().head
    assert(out.getAs[Int]("n_frames") == 9)
    val f = out.getSeq[Float](out.fieldIndex("features"))
    // replay the window assignment: win = i*8/9, exact integer sums
    val sums = new Array[Long](8)
    val counts = new Array[Long](8)
    samples.zipWithIndex.foreach { case (s, i) =>
      val w = i * 8 / 9
      sums(w) += s.toLong * s; counts(w) += 1
    }
    val expect = (0 until 8).map(w =>
      if (counts(w) == 0) 0.0f
      else (math.sqrt(sums(w).toDouble / counts(w)) / 32768.0).toFloat)
    assert(f == expect, s"got $f want $expect")
  }

  test("FLAC mono roundtrip: FIXED + LPC + Rice decode sample-exact") {
    // deterministic pseudo-noise: exercises rice params > 0, both subframe
    // flavors (even blocks FIXED, odd blocks LPC), and a short last frame
    val n = 1200
    val samples = Array.tabulate(n) { i =>
      val h = (i * 2654435761L + 123456789L) & 0xffffffffL
      ((h % 20001L) - 10000L).toInt
    }
    val bytes = Flac.encode16(Array(samples), rate = 22050, blockSize = 256)
    val fa = Flac.decode(bytes).get
    assert(fa.sampleRate == 22050 && fa.channels == 1 && fa.bitsPerSample == 16)
    assert(fa.samples(0).toSeq == samples.toSeq, "lossless roundtrip broken")
  }

  test("FLAC stereo roundtrip: left/side AND mid/side decorrelation exact") {
    val n = 700
    val left = Array.tabulate(n)(i => (math.sin(i * 0.1) * 9000).toInt)
    val right = Array.tabulate(n)(i => (math.cos(i * 0.07) * 7000).toInt)
    // blockSize 256 -> 3 frames: frame 0 left/side, frame 1 mid/side
    val bytes = Flac.encode16(Array(left, right), rate = 44100, blockSize = 256)
    val fa = Flac.decode(bytes).get
    assert(fa.channels == 2)
    assert(fa.samples(0).toSeq == left.toSeq, "left channel broken")
    assert(fa.samples(1).toSeq == right.toSeq, "right channel broken")
  }

  test("FLAC roundtrip: CONSTANT subframes and wasted bits") {
    // all-even samples -> 1 wasted bit; a flat prefix -> CONSTANT subframe
    val samples = Array.fill(300)(4096) ++ Array.tabulate(300)(i =>
      if (i % 2 == 0) 2048 else -2048)
    val bytes = Flac.encode16(Array(samples), rate = 8000, blockSize = 256)
    val fa = Flac.decode(bytes).get
    assert(fa.samples(0).toSeq == samples.toSeq)
  }

  test("FLAC square wave through decode(): same features as the WAV twin") {
    val (nS, rate, amp) = (800, 16000, 12345)
    val flacBytes = Multimodal.squareFlac(nS, rate, amp)
    val wavBytes = Multimodal.squareWav(nS, rate, amp)
    val rows = Multimodal.decode(mediaDF(
      (70L, "audio", flacBytes), (71L, "audio", wavBytes)))
      .collect().sortBy(_.getAs[Long]("id"))
    val Array(f, w) = rows
    assert(f.getAs[Int]("width") == rate && f.getAs[Int]("height") == 1)
    assert(f.getAs[Int]("n_frames") == nS)
    assert(f.getSeq[Float](f.fieldIndex("features")) ==
      w.getSeq[Float](w.fieldIndex("features")),
      "lossless decode must reproduce the PCM features bit-for-bit")
    // stereo variant: 2 channels, same first-channel RMS
    val st = Multimodal.decode(mediaDF(
      (72L, "audio", Multimodal.squareFlac(nS, rate, amp, stereo = true))))
      .collect().head
    assert(st.getAs[Int]("height") == 2 && st.getAs[Int]("n_frames") == nS)
    assert(st.getSeq[Float](st.fieldIndex("features")) ==
      w.getSeq[Float](w.fieldIndex("features")))
  }

  test("FLAC 24-bit decode: the wide (Double-sum) RMS path matches the 24-bit WAV twin") {
    val n = 600
    val amp = 1234567 // > 16-bit range: exercises the overflow-safe path
    val samples = Array.tabulate(n)(i => if (i % 2 == 0) amp else -amp)
    val flacBytes = Flac.encode(Array(samples), 8000, 256, bps = 24)
    val wavBytes = Multimodal.squareWavFmt(n, 8000, amp, 24, floatPcm = false)
    val rows = Multimodal.decode(mediaDF(
      (80L, "audio", flacBytes), (81L, "audio", wavBytes)))
      .collect().sortBy(_.getAs[Long]("id"))
    val Array(f, w2) = rows
    assert(f.getAs[Int]("n_frames") == n && f.getAs[Int]("height") == 1)
    assert(f.getSeq[Float](f.fieldIndex("features")) ==
      w2.getSeq[Float](w2.fieldIndex("features")),
      "24-bit FLAC must reproduce the 24-bit PCM features exactly")
  }

  test("FLAC corruption degrades governed: CRC mismatch falls to the stub") {
    val bytes = Multimodal.squareFlac(400, 8000, 1000)
    assert(Flac.decode(bytes).isDefined)
    val corrupt = bytes.clone()
    corrupt(bytes.length / 2) = (corrupt(bytes.length / 2) ^ 0x40).toByte
    assert(Flac.decode(corrupt).isEmpty, "CRC must catch a flipped bit")
    val out = Multimodal.decode(mediaDF((73L, "audio", corrupt))).collect().head
    // stub shape, not garbage samples
    assert(out.getAs[Int]("width") == (32 + corrupt.length % 608))
  }

  test("IMA ADPCM decode: all-zero blocks hold their predictors; stereo rejected to stub") {
    val bytes = Multimodal.imaAdpcmWav(rate = 8000, blockAlign = 32,
      predictors = Seq(1000, -1000, 1000, -1000))
    val out = Multimodal.decode(mediaDF((61L, "audio", bytes))).collect().head
    assert(out.getAs[Int]("width") == 8000 && out.getAs[Int]("height") == 1)
    assert(out.getAs[Int]("n_frames") == 4 * 57) // (32-4)*2+1 per block
    val f = out.getSeq[Float](out.fieldIndex("features"))
    assert(f.forall(v => math.round(v * 32768.0) == 1000L),
      s"flat-block RMS must equal |pred|: $f")
  }
}
