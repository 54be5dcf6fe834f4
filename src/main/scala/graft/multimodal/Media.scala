package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata (the brief's multimodal requirement; in the reference the
  * binary modality is the ROI image stream, SURVEY.md §1.1 "Images").
  *
  * Image decode/encode is REAL for PNG/BMP/GIF/JPEG via the JDK's
  * built-in `javax.imageio` (no external library needed) — the EcoTaxa
  * image path is PNG (ifcb-image-export-pipeline.Rmd:833-849). Raw
  * 8-bit payloads (the IFCB ROI stream) pass through unchanged. Audio /
  * video codecs remain out of scope (no libs in this container): those
  * payloads use the raw-bytes fallback, and [[sampleFrames]] treats
  * video as fixed-size frame slices.
  *
  * Kernels run via `mapPartitions` over a typed Dataset: one JVM-side
  * batch per partition (the Scala analog of `mapInPandas`), no per-row
  * UDF serialization, safe to scale by repartitioning on the id.
  */
object Media {

  private val PngMagic = Array(0x89, 'P', 'N', 'G').map(_.toByte)

  /** True when the payload starts with a magic ImageIO can decode:
    * PNG (89 50 4E 47), JPEG (FF D8 FF), GIF ("GIF8"), BMP ("BM").
    * Public-ish for callers whose source is DEFINITIONALLY a container
    * (a `*.png` stream glob): they must reject non-container bytes
    * instead of letting [[decodeImage]]'s raw-payload fallback render a
    * corrupt file as a degenerate 0×0 raster (round-12 review).
    */
  private[graft] def isContainerImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (
      bytes.take(4).sameElements(PngMagic) ||
      ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) ||
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') ||
      isBmp(bytes))

  /** BMP needs more than the 2-byte 'BM' magic (round-13 review): two
    * mid-gray leading pixels (66, 77) in a RAW grayscale payload
    * satisfy it — ~1/65536 of random payloads, far more in real
    * imagery — misrouting valid ROI rasters into ImageIO, which then
    * throws on the non-BMP body and kills the task. A real BMP header
    * also carries four reserved zero bytes at 6-9, a DIB header whose
    * size field at bytes 14-17 is one of the published header sizes,
    * and usually the file size at bytes 2-5 — but bfSize is stamped 0
    * or inaccurately by real-world writers (round-13 ADVICE), so a
    * wrong bfSize only rejects when the DIB size field ALSO fails:
    * trusting bfSize alone dropped genuine BMPs to the raw-grayscale
    * path, where grayPixels rejects them on a size mismatch.
    */
  private def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= 18 && bytes(0) == 'B' && bytes(1) == 'M' &&
      bytes(6) == 0 && bytes(7) == 0 && bytes(8) == 0 && bytes(9) == 0 && {
      val claimed = (bytes(2) & 0xffL) | ((bytes(3) & 0xffL) << 8) |
        ((bytes(4) & 0xffL) << 16) | ((bytes(5) & 0xffL) << 24)
      val dibSize = (bytes(14) & 0xffL) | ((bytes(15) & 0xffL) << 8) |
        ((bytes(16) & 0xffL) << 16) | ((bytes(17) & 0xffL) << 24)
      // 12 = BITMAPCOREHEADER, 40 = BITMAPINFOHEADER, 52/56 = v2/v3,
      // 64 = OS/2 2.x, 108 = v4, 124 = v5. NO bare `claimed == 0`
      // acceptance (round-14 review): a zero-bfSize writer still writes
      // a valid DIB size (the disjunct below accepts it), while a raw
      // grayscale raster starting 'B','M' + a dark run of zeros would
      // satisfy claimed==0 alone and get misrouted into ImageIO
      claimed == bytes.length ||
        Seq(12L, 40L, 52L, 56L, 64L, 108L, 124L).contains(dibSize)
    }

  /** Widens a raw 8-bit grayscale payload to int pixels, loudly: the
    * shared helper for every kernel entry point (round-11 review — the
    * loop existed as three verbatim copies, each assuming
    * `bytes.length >= w*h` and dying mid-loop with a raw
    * ArrayIndexOutOfBounds on a short payload).
    */
  def grayPixels(bytes: Array[Byte], w: Int, h: Int): Array[Int] = {
    require(w >= 0 && h >= 0 && w.toLong * h <= Int.MaxValue,
      s"bad raster dims ${w}x$h")
    val n = w * h
    // EXACT length, both directions (round-14 review: the short side was
    // made fail-loud in round 11, but an over-long payload — corrupt
    // metadata under-claiming the raster — silently truncated to the
    // top rows and computed plausible features of half an image; every
    // producer slices exactly w·h bytes)
    require(bytes.length == n,
      s"raw pixel payload of ${bytes.length} bytes vs declared ${w}x$h = $n")
    val px = new Array[Int](n)
    var k = 0
    while (k < n) { px(k) = bytes(k) & 0xff; k += 1 }
    px
  }

  /** Decodes an image payload to 8-bit grayscale pixels + dimensions:
    * container formats (PNG/JPEG/GIF/BMP, sniffed by magic) through
    * ImageIO with ITU-R BT.601 luma conversion; anything else is raw
    * 8-bit pixels (the ROI-stream layout) with caller-supplied
    * dimensions.
    */
  def decodeImage(bytes: Array[Byte], rawW: Int, rawH: Int): (Array[Int], Int, Int) = {
    // an EXACT raw-raster length match against the caller's declared
    // dims outranks the WEAK BMP sniff (round-14 review): a raw
    // grayscale ROI whose dark leading bytes mimic a BMP header (the
    // DIB-size disjunct fires on zero-heavy imagery far more often than
    // 2^-16) was misrouted into ImageIO, which then kills the task on
    // the non-BMP body. Only the BMP sniff yields: a real BMP's file
    // length ≈ never equals the caller's w·h (header + row padding),
    // while the STRONG magics (PNG/JPEG/GIF) keep priority — yielding
    // those on a length coincidence would decode a genuine container as
    // silent raw garbage, the worse failure.
    val exactRaw = rawW > 0 && rawH > 0 && rawW.toLong * rawH == bytes.length
    val strongMagic = bytes.length >= 4 && (
      bytes.take(4).sameElements(PngMagic) ||
      ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) ||
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'))
    if (strongMagic || (!exactRaw && isContainerImage(bytes))) {
      // fail-loudly contract (round-11, the MatSource/H5Source pattern):
      // ImageIO throws IOExceptions AND assorted RuntimeExceptions on
      // hostile bytes — normalize everything to the one contract type
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch {
          case e @ (_: java.io.IOException | _: RuntimeException) =>
            throw new IllegalArgumentException(
              s"undecodable container-image payload: $e", e)
        }
      require(img != null, "undecodable container-image payload")
      val w = img.getWidth; val h = img.getHeight
      val px = new Array[Int](w * h)
      // the raw-raster fast path is ONLY valid for true 8-bit grayscale
      // (round-12 review): numBands == 1 also holds for palette-indexed
      // images (every GIF — samples are palette INDICES, not levels),
      // 16-bit grayscale PNG (samples up to 65535, breaking the 8-bit
      // pixel contract downstream), and 1-bit bilevel (samples 0/1).
      // Those route through getRGB + luma, which resolves the palette /
      // scales the depth to 8 bits.
      val cm = img.getColorModel
      val plainGray = img.getRaster.getNumBands == 1 &&
        !cm.isInstanceOf[java.awt.image.IndexColorModel]
      val grayDepth = if (plainGray) cm.getComponentSize(0) else 0
      if (grayDepth == 8 || grayDepth == 16) {
        // grayscale: read raster samples directly (getRGB would route
        // through sRGB color management and distort the levels —
        // round-14 review: 16-bit gray went through getRGB's
        // linear-to-sRGB curve, turning true mid-gray 32768 into ~188;
        // scaling the sample preserves levels)
        val shift = grayDepth - 8
        val raster = img.getRaster
        for (y <- 0 until h; x <- 0 until w)
          px(y * w + x) = raster.getSample(x, y, 0) >> shift
      } else {
        // ONE bulk getRGB pass (round-14 review): per-pixel getRGB pays
        // bounds checks + color-model dispatch per call on the kernel path
        val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < rgbs.length) {
          val rgb = rgbs(i)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          px(i) = ((299 * r + 587 * g + 114 * b) + 500) / 1000
          i += 1
        }
      }
      (px, w, h)
    } else {
      // raw 8-bit payload: through the bounds-checked helper so a
      // payload short of the declared raster raises loudly instead of
      // returning px.length != w*h (round-11 review; resize would have
      // silently black-padded it)
      (grayPixels(bytes, rawW, rawH), rawW, rawH)
    }
  }

  /** Decodes a RIFF/WAVE PCM payload (8/16-bit, any channel count) to
    * normalized [-1, 1] mono samples + sample rate — straight from the
    * public RIFF spec, no codec library. Non-WAV payloads (no RIFF
    * magic) raise; PCM is the only supported encoding (format tag 1).
    */
  def decodeWav(bytes: Array[Byte]): (Array[Double], Int) = try {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // >= 44, not > 44: a complete header plus a ZERO-length data chunk
    // is exactly 44 bytes and is a valid (empty) clip (round-12 review)
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE payload")
    var p = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var data: Option[(Int, Int)] = None
    while (p + 8 <= bytes.length && (sampleRate == 0 || data.isEmpty)) {
      val id = new String(bytes, p, 4, "US-ASCII")
      val size = buf.getInt(p + 4)
      require(size >= 0, s"malformed WAVE chunk '$id': negative size $size")
      id match {
        case "fmt " =>
          // the PCM fmt chunk is >= 16 bytes; a shorter (or truncated)
          // one must reject with this diagnostic, not a raw
          // IndexOutOfBounds from reading fields past the file
          require(size >= 16 && p + 24 <= bytes.length,
            s"malformed WAVE fmt chunk: size $size at offset $p")
          val tag = buf.getShort(p + 8) & 0xffff
          require(tag == 1, s"unsupported WAVE encoding $tag (PCM only)")
          channels = buf.getShort(p + 10) & 0xffff
          require(channels >= 1, "malformed WAVE fmt chunk: zero channels")
          sampleRate = buf.getInt(p + 12)
          bits = buf.getShort(p + 22) & 0xffff
        case "data" => data = Some((p + 8, size))
        case _ => ()
      }
      // word-aligned advance in Long: a near-Int.MaxValue chunk size
      // would wrap p negative and re-enter the loop reading at a
      // negative offset; clamping to file end terminates instead
      p = math.min(p.toLong + 8 + size + (size & 1), bytes.length.toLong).toInt
    }
    val (off, size) = data.getOrElse(throw new IllegalArgumentException("no data chunk"))
    require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
    // a rate field >= 2^31 reads negative through getInt: reject like
    // every other malformed header field instead of emitting negative
    // durations downstream (round-11 review)
    require(sampleRate > 0, s"malformed WAVE sample rate $sampleRate")
    val bytesPerFrame = channels * bits / 8
    val nFrames = math.min(size, bytes.length - off) / bytesPerFrame
    val out = new Array[Double](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0.0
      var c = 0
      while (c < channels) {
        val q = off + f * bytesPerFrame + c * bits / 8
        acc += (if (bits == 16) buf.getShort(q) / 32768.0
                else ((bytes(q) & 0xff) - 128) / 128.0)
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    (out, sampleRate)
  } catch {
    case e: IllegalArgumentException => throw e
    case e: RuntimeException =>
      throw new IllegalArgumentException(s"malformed WAVE payload: $e", e)
  }

  final case class AudioFeatures(
      media_id: Long, n_samples: Long, sample_rate: Int,
      duration_s: Double, rms: Double, peak: Double)

  /** Per-clip audio features over decoded WAV payloads — same
    * partition-local kernel shape as [[imageFeatures]].
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (samples, rate) = decodeWav(m.bytes)
        var sumSq = 0.0
        var peak = 0.0
        for (s <- samples) {
          sumSq += s * s
          val a = math.abs(s)
          if (a > peak) peak = a
        }
        AudioFeatures(m.media_id, samples.length.toLong, rate,
          if (rate == 0) 0.0 else samples.length.toDouble / rate,
          if (samples.isEmpty) 0.0 else math.sqrt(sumSq / samples.length), peak)
      }
    }
  }

  /** Encodes 8-bit grayscale pixels as PNG (the EcoTaxa image format).
    * Fail-loud contract (round-12 review, the grayPixels precedent): a
    * short pixel array or an out-of-range value would otherwise ship a
    * structurally-valid-but-garbage PNG to EcoTaxa (TYPE_BYTE_GRAY
    * setSample silently stores the low byte — 256 becomes 0).
    */
  def encodePng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(px.length >= w * h,
      s"encodePng: ${px.length} pixels for a ${w}x$h raster")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(y * w + x)
      require(v >= 0 && v <= 255, s"encodePng: pixel $v outside 0-255 at ($x,$y)")
      raster.setSample(x, y, 0, v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class ImageFeatures(
      media_id: Long, n_bytes: Long, mean_px: Double, max_px: Int,
      aspect: Double)

  final case class Frame(media_id: Long, frame_no: Int, bytes: Array[Byte])

  /** Per-image feature extraction — the §2.10 heavy-compute kernel shape:
    * partition-local, no shuffle, emits a narrow typed row per image.
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        // aspect comes from the DECODED dims, like the pixel stats: a
        // container row with unset metadata (0, 0) previously reported
        // aspect 0.0 for a perfectly decodable image (round-11 review)
        val (px, w, h) = decodeImage(m.bytes, m.width, m.height)
        // one fused pass (round-14 review): map(_.toLong) materialized
        // an 8-byte-per-pixel copy just to sum it, then px.max scanned
        // a third time
        var sum = 0L
        var maxPx = 0
        var i = 0
        while (i < px.length) {
          val v = px(i)
          sum += v
          if (v > maxPx) maxPx = v
          i += 1
        }
        val mean = if (px.isEmpty) 0.0 else sum.toDouble / px.length
        ImageFeatures(
          m.media_id, m.bytes.length.toLong, mean, maxPx,
          if (h == 0) 0.0 else w.toDouble / h)
      }
    }
  }

  /** Nearest-neighbor resize over the decoded grayscale raster (PNG or
    * raw payloads); output is raw 8-bit pixels. Partition-local,
    * binary→binary — the plan shape any resize kernel keeps.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val (px, sw, sh) = decodeImage(m.bytes, m.width, m.height)
        if (sw <= 0 || sh <= 0) m.copy(width = 0, height = 0, bytes = Array.empty)
        else {
          val out = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // Long intermediates: x * sw overflows Int for a source
              // dimension near 2^31 (grayPixels only bounds the PRODUCT
              // w*h), yielding a negative or wrong sample index
              // (round-12 review)
              val sx = (x.toLong * sw / w).toInt
              val sy = (y.toLong * sh / h).toInt
              val idx = sy * sw + sx
              out(y * w + x) = if (idx < px.length) px(idx).toByte else 0
              x += 1
            }
            y += 1
          }
          m.copy(bytes = out, width = w, height = h)
        }
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size
    * frame slice becomes a row (generator/UDTF shape, §2.10) — pure
    * relational explode over computed offsets, no kernel needed.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames", (length(col("bytes")) / frameBytes).cast("int"))
      .withColumn("frame_no",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride))))
      .filter(col("n_frames") > 0)
      .select(
        col("media_id"), col("frame_no"),
        expr(s"substring(bytes, frame_no * $frameBytes + 1, $frameBytes)").as("bytes"))
}
