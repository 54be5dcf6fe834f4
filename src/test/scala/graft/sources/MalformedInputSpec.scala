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
}
