package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import java.util.zip.Deflater
import graft.SparkSpec
import MatSource._

/** MAT-5 parser: fixtures are written by a tiny spec-local writer that
  * follows the same public format spec, including the compressed and
  * small-element encodings.
  */
class MatSourceSpec extends SparkSpec {

  // fixture writer shared with ManualMergeSpec
  import MatFixture.{element, matrix, doubles, matFile, charMatrix, stripTag}

  // --- tests ---------------------------------------------------------------

  test("numeric, char and cell-of-strings variables round-trip") {
    val scores = matrix("TBscores", 6, Seq(3, 2), doubles(
      // column-major 3x2: col0 = (.1,.2,.3), col1 = (.9,.8,.7)
      Seq(0.1, 0.2, 0.3, 0.9, 0.8, 0.7)), 9)
    val cells = matrix("class2useTB", 1, Seq(2, 1), Array.empty, 0,
      cells = Seq(
        // nested char matrices, stripped of their outer element tag
        stripTag(charMatrix("", "Mesodinium")),
        stripTag(charMatrix("", "Skeletonema"))))
    val bytes = matFile(scores, cells)
    val vars = parse(bytes)
    val MatNum(dims, data) = vars("TBscores"): @unchecked
    assert(dims == Seq(3, 2) && data.length == 6 && data(3) == 0.9)
    val MatCell(_, items) = vars("class2useTB"): @unchecked
    assert(items == Seq(MatStr("Mesodinium"), MatStr("Skeletonema")))
  }

  test("compressed elements are inflated") {
    val plain = matrix("x", 6, Seq(1, 2), doubles(Seq(4.0, 5.0)), 9)
    val deflater = new Deflater()
    deflater.setInput(plain); deflater.finish()
    val buf = new Array[Byte](plain.length * 2 + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val bytes = matFile(element(15, java.util.Arrays.copyOf(buf, n)))
    val MatNum(_, data) = parse(bytes)("x"): @unchecked
    assert(data.toSeq == Seq(4.0, 5.0))
  }

  test("class2use / manualClassList degrade to empty on missing or mis-shaped variables") {
    val dir = Files.createTempDirectory("matviews")
    // a numeric-only file: no cell variable anywhere → class2use empty
    Files.write(dir.resolve("D20240101T000000_IFCB134.mat"),
      matFile(matrix("notclasses", 6, Seq(1, 2), doubles(Seq(1.0, 2.0)), 9)))
    assert(MatSource.class2use(spark, dir.toString).count() == 0)
    // classlist with too few columns → no rows, no crash
    assert(MatSource.manualClassList(spark, dir.toString).count() == 0)
    val dir2 = Files.createTempDirectory("matviews2")
    Files.write(dir2.resolve("D20240102T000000_IFCB134.mat"),
      matFile(matrix("classlist", 6, Seq(2, 1), doubles(Seq(1.0, 2.0)), 9)))
    assert(MatSource.manualClassList(spark, dir2.toString).count() == 0)
  }

  test("classScores explodes per-ROI rows with labels from the class list") {
    val dir = Files.createTempDirectory("mat")
    val scores = matrix("TBscores", 6, Seq(2, 2), doubles(Seq(0.9, 0.2, 0.1, 0.8)), 9)
    val cells = matrix("class2useTB", 1, Seq(2, 1), Array.empty, 0,
      cells = Seq(stripTag(charMatrix("", "A")), stripTag(charMatrix("", "B"))))
    Files.write(dir.resolve("D20240101T123000_IFCB134_class.mat"),
      matFile(scores, cells))
    val df = MatSource.classScores(spark, dir.toString)
    val rows = df.orderBy("roi_number").collect()
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getAs[String]("sample") == "D20240101T123000_IFCB134")
    assert(r1.getAs[scala.collection.Seq[Double]]("scores").toSeq == Seq(0.9, 0.1))
    assert(r1.getAs[scala.collection.Seq[String]]("class_labels").toSeq == Seq("A", "B"))
  }
}
