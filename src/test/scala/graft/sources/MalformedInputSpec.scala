package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Binary readers must fail loudly on malformed payloads — wrong magic
  * and truncation raise immediately; nothing loops or silently returns
  * partial data.
  */
class MalformedInputSpec extends AnyFunSuite {

  private val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)

  test("H5Source rejects wrong magic and truncation") {
    intercept[IllegalArgumentException](H5Source.parse(junk))
    intercept[IllegalArgumentException](H5Source.parse(Array[Byte](0x89.toByte, 'H', 'D')))
    val valid = H5Fixture.write(Seq(H5Fixture.I32("x", Array(1, 2, 3))))
    intercept[Exception](H5Source.parse(valid.take(valid.length / 2)))
  }

  test("SqliteSource rejects wrong magic and truncation") {
    intercept[IllegalArgumentException](
      SqliteSource.readTable(new Array[Byte](600), "t"))
    val valid = SqliteFixture.write("t", Seq("a" -> "TEXT"), Seq(Seq("v")))
    intercept[Exception](SqliteSource.readTable(valid.take(700), "t"))
  }

  test("ShapefileSource rejects wrong magic and short files") {
    intercept[IllegalArgumentException](ShapefileSource.readShp(junk))
    intercept[IllegalArgumentException](ShapefileSource.readShp(new Array[Byte](10)))
    intercept[IllegalArgumentException](
      ShapefileSource.readWkbPolygon(Array[Byte](1, 1, 0, 0, 0))) // point, not polygon
  }

  test("MatSource and Media codecs reject malformed payloads") {
    intercept[IllegalArgumentException](MatSource.parse(junk))
    intercept[Exception](graft.multimodal.Media.decodeWav(junk))
    // PNG magic but garbage body
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G') ++ junk
    intercept[Exception](graft.multimodal.Media.decodeImage(fakePng, 0, 0))
  }

  test("decodeWav raises on a negative chunk size instead of looping") {
    // valid RIFF/WAVE preamble, then a chunk whose size field is -8:
    // the naive scan would stop advancing and spin forever
    val b = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(56)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("junk".getBytes("US-ASCII")).putInt(-8)
    val ex = intercept[IllegalArgumentException](
      graft.multimodal.Media.decodeWav(b.array()))
    assert(ex.getMessage.contains("negative size"))
  }

  test("decodeImage sniffs JPEG/GIF/BMP magics (no silent raw fallback)") {
    // garbage after a real container magic must raise, not produce
    // garbage "raw pixel" features
    val fakeJpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ junk
    intercept[Exception](graft.multimodal.Media.decodeImage(fakeJpeg, 8, 8))
    val fakeGif = "GIF8".getBytes("US-ASCII") ++ junk
    intercept[Exception](graft.multimodal.Media.decodeImage(fakeGif, 8, 8))
    // and a REAL BMP round-trips through ImageIO with exact gray levels
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 2; x <- 0 until 3) img.getRaster.setSample(x, y, 0, y * 3 + x + 10)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    val (px, w, h) = graft.multimodal.Media.decodeImage(out.toByteArray, 0, 0)
    assert((w, h) == (3, 2) && px.toSeq == Seq(10, 11, 12, 13, 14, 15))
    // real-world writers commonly stamp bfSize = 0 (round-13 ADVICE):
    // the DIB header size field must still route such BMPs to ImageIO
    // instead of dropping them to the raw path (where grayPixels
    // rejects on a size mismatch)
    val zeroSize = out.toByteArray.clone()
    zeroSize(2) = 0; zeroSize(3) = 0; zeroSize(4) = 0; zeroSize(5) = 0
    val (px0, w0, h0) = graft.multimodal.Media.decodeImage(zeroSize, 0, 0)
    assert((w0, h0) == (3, 2) && px0.toSeq == px.toSeq)
    // an INACCURATE (nonzero, wrong) bfSize also routes via the DIB field
    val offSize = out.toByteArray.clone()
    offSize(2) = 1; offSize(3) = 0; offSize(4) = 0; offSize(5) = 0
    val (px1, w1, h1) = graft.multimodal.Media.decodeImage(offSize, 0, 0)
    assert((w1, h1) == (3, 2) && px1.toSeq == px.toSeq)
    // while a raw raster that merely STARTS 'B','M' (mid-gray pixels)
    // still routes raw: reserved bytes / DIB field don't line up
    val rawBm = Array[Byte]('B', 'M') ++ Array.tabulate[Byte](62)(i => (100 + i).toByte)
    val (pxr, wr, hr) = graft.multimodal.Media.decodeImage(rawBm, 8, 8)
    assert((wr, hr) == (8, 8) && pxr(0) == 'B'.toInt)
    // and so does a DARK-leading raw raster ('BM' + a run of zeros):
    // bytes 2-5 spell bfSize 0, which must NOT be accepted on its own —
    // the DIB size field (pixel bytes 14-17 here) doesn't line up, so
    // this stays raw (round-14 review: bare claimed==0 misrouted it)
    val darkBm = Array[Byte]('B', 'M') ++ new Array[Byte](12) ++
      Array.tabulate[Byte](50)(i => (20 + i).toByte)
    val (pxd, wd, hd) = graft.multimodal.Media.decodeImage(darkBm, 8, 8)
    assert((wd, hd) == (8, 8) && pxd(0) == 'B'.toInt && pxd(2) == 0)
  }

  test("Zlib.inflate rejects truncated streams rather than returning partial bytes") {
    val deflater = new java.util.zip.Deflater()
    val payload = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    deflater.setInput(payload)
    deflater.finish()
    val buf = new Array[Byte](8192)
    val n = deflater.deflate(buf)
    deflater.end()
    val full = buf.take(n)
    // full stream round-trips
    assert(Zlib.inflate(full, "test").sameElements(payload))
    // truncated stream must throw, not silently return a prefix
    val e = intercept[IllegalArgumentException](Zlib.inflate(full.take(n / 2), "test"))
    assert(e.getMessage.contains("truncated"))
  }

  test("Zlib.inflate caps inflated output (zip-bomb guard)") {
    // highly compressible payload: 1 MB of zeros deflates to ~1 KB
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(new Array[Byte](1 << 20))
    deflater.finish()
    val buf = new Array[Byte](1 << 16)
    val n = deflater.deflate(buf)
    deflater.end()
    val bomb = buf.take(n)
    // under the cap: inflates fine
    assert(Zlib.inflate(bomb, "test").length == (1 << 20))
    // over a tight cap: rejected loudly, with the reader-contract type
    val e = intercept[IllegalArgumentException](
      Zlib.inflate(bomb, "test", maxOut = 64 * 1024))
    assert(e.getMessage.contains("cap"))
  }

  test("Zlib.inflate rejects corrupted streams with the contract exception type") {
    val deflater = new java.util.zip.Deflater()
    val payload = Array.tabulate[Byte](4096)(i => (i % 251).toByte)
    deflater.setInput(payload)
    deflater.finish()
    val buf = new Array[Byte](8192)
    val n = deflater.deflate(buf)
    deflater.end()
    // flip bytes in the middle of the deflate data: Inflater raises the
    // checked DataFormatException, which must surface as the same
    // IllegalArgumentException every other malformed-input path uses
    val corrupt = buf.take(n)
    for (i <- n / 3 until n / 3 + 8) corrupt(i) = (corrupt(i) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](Zlib.inflate(corrupt, "test"))
    assert(e.getMessage.contains("bad zlib stream") ||
      e.getMessage.contains("truncated"))
  }
}
