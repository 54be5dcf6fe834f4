package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing + the real JDK PNG codec path. */
class MediaSpec extends SparkSpec {
  import spark.implicits._
  import Media._

  private def img(id: Long, w: Int, h: Int, fill: Int): MediaRow =
    MediaRow(id, "image", Array.fill[Byte](w * h)(fill.toByte), w, h, 0)

  test("imageFeatures computes per-image stats partition-locally") {
    val ds = Seq(img(1, 4, 2, 10), img(2, 2, 2, 200)).toDS().repartition(2)
    val f = imageFeatures(ds).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).n_bytes == 8 && f(1L).mean_px == 10.0 && f(1L).aspect == 2.0)
    assert(f(2L).mean_px == 200.0 && f(2L).max_px == 200)
  }

  test("resize produces the target geometry and preserves constant fill") {
    val out = resize(Seq(img(1, 8, 8, 42)).toDS(), 4, 4).collect().head
    assert(out.width == 4 && out.height == 4 && out.bytes.length == 16)
    assert(out.bytes.forall(_ == 42.toByte))
  }

  test("png encode/decode round-trips grayscale pixels exactly") {
    val w = 7; val h = 5
    val px = Array.tabulate(w * h)(k => (k * 37) % 256)
    val png = Media.encodePng(px, w, h)
    assert(png.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val (back, dw, dh) = Media.decodeImage(png, 0, 0)
    assert(dw == w && dh == h)
    assert(back.sameElements(px))
  }

  test("imageFeatures and resize handle PNG payloads through the codec") {
    val px = Array.fill(16)(42)
    val png = Media.encodePng(px, 4, 4)
    val ds = Seq(MediaRow(9L, "image", png, 4, 4, 0)).toDS()
    val f = imageFeatures(ds).collect().head
    assert(f.mean_px == 42.0 && f.max_px == 42)
    val r = resize(ds, 2, 2).collect().head
    assert(r.bytes.length == 4 && r.bytes.forall(_ == 42.toByte))
  }

  test("feature kernel runs end-to-end on a PNG input") {
    // encode a synthetic roi as PNG, decode through Media, segment+extract
    val (raw, h, w) = graft.queries.FeatureExtract.renderRoi(123L)
    val png = Media.encodePng(raw.map(_ & 0xff), w, h)
    val (px, dw, dh) = Media.decodeImage(png, 0, 0)
    assert(dw == w && dh == h)
    val row = graft.features.Features.computeFromRoi(123L,
      graft.features.Segmentation.Gray(dh, dw, px))
    assert(row.numBlobs > 0 && row.Biovolume > 0)
  }

  test("wav decode + audio features: 16-bit PCM sine, known rms") {
    // hand-built RIFF/WAVE: 1 channel, 16-bit, 8000 Hz, one second sine
    val rate = 8000
    val n = rate
    val samples = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * 440 * i / rate) * 16384).toInt.toShort)
    val b = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(2 * n)
    samples.foreach(b.putShort)
    val wav = b.array()
    val (decoded, r) = Media.decodeWav(wav)
    assert(r == rate && decoded.length == n)
    val ds = Seq(MediaRow(5L, "audio", wav, 0, 0, rate)).toDS()
    val f = Media.audioFeatures(ds).collect().head
    assert(f.n_samples == n && f.duration_s == 1.0)
    // sine rms = amplitude/sqrt(2); amplitude = 16384/32768 = 0.5
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 1e-3, f.rms)
    assert(math.abs(f.peak - 0.5) < 1e-3)
  }

  test("palette-indexed images decode to palette LEVELS, not indices") {
    // round-12 review: the numBands==1 raster fast path returned raw
    // palette indices for indexed images (every GIF). Descending
    // palette: index 0 -> white (255), index 1 -> black (0) — the old
    // path read back 0/1.
    val palette = Array.tabulate(256)(i => 255 - i) // descending gray
    val icm = new java.awt.image.IndexColorModel(8, 256,
      palette.map(_.toByte), palette.map(_.toByte), palette.map(_.toByte))
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    img.getRaster.setSample(0, 0, 0, 0) // index 0 = 255 white
    img.getRaster.setSample(1, 0, 0, 1) // index 1 = 254
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    val (px, w, h) = Media.decodeImage(out.toByteArray, 0, 0)
    assert(w == 2 && h == 1)
    assert(px(0) == 255 && px(1) == 254, px.toSeq)
  }

  test("16-bit grayscale PNG decodes inside the 8-bit pixel contract") {
    // round-12 review: TYPE_USHORT_GRAY samples reach 65535 through the
    // raster fast path, breaking every 0-255 consumer (resize .toByte,
    // encodePng, max_px)
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    img.getRaster.setSample(0, 0, 0, 65535) // full-scale white
    img.getRaster.setSample(1, 0, 0, 0)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val (px, _, _) = Media.decodeImage(out.toByteArray, 0, 0)
    assert(px.forall(v => v >= 0 && v <= 255), px.toSeq)
    assert(px(0) > px(1), "white must stay above black after depth scaling")
  }

  test("encodePng fails loudly on short arrays and out-of-range pixels") {
    intercept[IllegalArgumentException](Media.encodePng(Array(1, 2, 3), 2, 2))
    intercept[IllegalArgumentException](Media.encodePng(Array(0, 256, 0, 0), 2, 2))
    intercept[IllegalArgumentException](Media.encodePng(Array(0, -1, 0, 0), 2, 2))
  }

  test("a 44-byte WAV (empty data chunk) decodes to zero samples") {
    // round-12 review: the old > 44 guard rejected a complete header
    // with a zero-length data chunk as "not RIFF/WAVE"
    val b = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(0)
    val (samples, rate) = Media.decodeWav(b.array())
    assert(samples.isEmpty && rate == 8000)
  }

  test("sampleFrames explodes strided fixed-size frames") {
    val media = Seq((1L, Array.tabulate[Byte](40)(_.toByte))).toDF("media_id", "bytes")
    val frames = sampleFrames(media, frameBytes = 10, stride = 2)
      .select("media_id", "frame_no").as[(Long, Int)].collect().toSet
    assert(frames == Set((1L, 0), (1L, 2))) // frames 0..3, stride 2
    val bytes = sampleFrames(media, 10, 2)
      .filter($"frame_no" === 2).select("bytes").as[Array[Byte]].head()
    assert(bytes.toSeq == (20 until 30).map(_.toByte))
  }
}
