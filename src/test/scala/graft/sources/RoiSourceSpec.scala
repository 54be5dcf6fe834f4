package graft.sources

import java.nio.file.Files
import graft.SparkSpec

/** S3 binary source: adc offsets slice roi bytes into per-image rows. */
class RoiSourceSpec extends SparkSpec {
  import spark.implicits._

  test("slices images out of the roi byte stream by adc offsets") {
    val dir = Files.createTempDirectory("roi")
    // two images: 2x2 at offset 0, 3x1 at offset 4; a zero-area trigger
    val pixels = Array.tabulate[Byte](7)(i => (i + 1).toByte)
    Files.write(dir.resolve("D20240101T123000_IFCB134.roi"), pixels)
    Files.writeString(dir.resolve("D20240101T123000_IFCB134.adc"),
      """roi_number,width,height,start_byte
        |1,2,2,0
        |2,0,0,4
        |3,3,1,4
        |""".stripMargin)
    val imgs = RoiSource.read(spark, dir.toString)
      .orderBy("roi_number").collect()
    assert(imgs.length == 2) // zero-area trigger dropped
    val first = imgs(0)
    assert(first.getAs[String]("sample") == "D20240101T123000_IFCB134")
    assert(first.getAs[Array[Byte]]("pixels").toSeq == Seq[Byte](1, 2, 3, 4))
    assert(imgs(1).getAs[Array[Byte]]("pixels").toSeq == Seq[Byte](5, 6, 7))
  }
}
