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

  test("a mid-stream truncation rejects loudly instead of dropping later variables") {
    // round-12 review: parseBody used to silently STOP on an element
    // whose claimed length ran past the file — a truncated file read as
    // "the later variables are missing" with zero rows and no error
    val two = matFile(
      matrix("first", 6, Seq(1, 2), doubles(Seq(1.0, 2.0)), 9),
      matrix("TBscores", 6, Seq(1, 2), doubles(Seq(3.0, 4.0)), 9))
    // cut inside the SECOND element's payload (its >=56-byte miMATRIX
    // body loses the last 8 bytes, so the tag's claimed length now
    // runs past the file)
    val cut = two.take(two.length - 8)
    val e = intercept[IllegalArgumentException](parse(cut))
    assert(e.getMessage.contains("claimed length"), e.getMessage)
    // intact file still parses both
    assert(parse(two).keySet == Set("first", "TBscores"))
  }

  test("MatSink round-trips numeric/char/cell variables, byte-deterministically") {
    val data = Array(1.0, 2.0, 3.0, 5.0, Double.NaN, 1.0, Double.NaN, 4.0, Double.NaN)
    val vars = Seq(
      "classlist" -> MatNum(Seq(3, 3), data),
      "note" -> MatStr("Tångesund µ-grid"),
      "empty" -> MatStr(""),
      "class2use_manual" -> MatCell(Seq(1, 3),
        Seq(MatStr("unclassified"), MatStr("Mesodinium_rubrum"), MatStr(""))))
    val bytes = MatSink.write(vars)
    assert(bytes.sameElements(MatSink.write(vars)), "writer must be deterministic")
    val back = parse(bytes)
    assert(back.keySet ==
      Set("classlist", "note", "empty", "class2use_manual"))
    val MatNum(dims, got) = back("classlist"): @unchecked
    assert(dims == Seq(3, 3))
    assert(got.length == data.length)
    got.zip(data).foreach { case (g, w) =>
      assert(g == w || (g.isNaN && w.isNaN), s"$g vs $w")
    }
    assert(back("note") == MatStr("Tångesund µ-grid"))
    assert(back("empty") == MatStr(""))
    val MatCell(cd, items) = back("class2use_manual"): @unchecked
    assert(cd == Seq(1, 3))
    assert(items == Seq(MatStr("unclassified"), MatStr("Mesodinium_rubrum"), MatStr("")))
    // compressed framing (the reference's do_compression = TRUE):
    // smaller file, identical values back through the reader's
    // miCOMPRESSED path, still deterministic
    val zbytes = MatSink.write(vars, compress = true)
    assert(zbytes.sameElements(MatSink.write(vars, compress = true)))
    assert(zbytes.length < bytes.length, s"${zbytes.length} vs ${bytes.length}")
    val zback = parse(zbytes)
    assert(zback.keySet == back.keySet)
    val MatNum(zd, zg) = zback("classlist"): @unchecked
    assert(zd == Seq(3, 3))
    zg.zip(got).foreach { case (a, b) => assert(a == b || (a.isNaN && b.isNaN)) }
    assert(zback("note") == MatStr("Tångesund µ-grid"))
  }

  test("MatSink.class2useBytes reads back via MatSource.class2use (1-based)") {
    val dir = Files.createTempDirectory("matsink")
    val f = dir.resolve("class2use_test.mat")
    Files.write(f, MatSink.class2useBytes(Seq("unclassified", "Alexandrium", "Tripos")))
    val got = MatSource.class2use(spark, f.toString)
      .orderBy("class_idx").collect()
      .map(r => r.getInt(0) -> r.getString(1))
    assert(got.toSeq == Seq(1 -> "unclassified", 2 -> "Alexandrium", 3 -> "Tripos"))
  }

  test("MatSink.manualBytes reads back via manualClassList with NaN slots null") {
    val dir = Files.createTempDirectory("matsink2")
    val rows = Seq(
      (1, Some(5): Option[Int], None: Option[Int]),
      (2, None: Option[Int], Some(3): Option[Int]),
      (7, Some(1): Option[Int], Some(1): Option[Int]))
    Files.write(dir.resolve("D20240101T000000_IFCB134.mat"),
      MatSink.manualBytes(rows, Seq("unclassified", "A")))
    val got = MatSource.manualClassList(spark, dir.toString)
      .orderBy("roi_number").collect()
    assert(got.length == 3)
    assert(got(0).getAs[String]("sample") == "D20240101T000000_IFCB134")
    assert(got(0).getInt(1) == 1 && got(0).getAs[Integer]("manual_idx") == 5
      && got(0).isNullAt(3))
    assert(got(1).getInt(1) == 2 && got(1).isNullAt(2)
      && got(1).getAs[Integer]("auto_idx") == 3)
    assert(got(2).getInt(1) == 7 && got(2).getAs[Integer]("manual_idx") == 1)
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

  test("MAT v7.3 (HDF5 container) parses identically to its Level-5 twin") {
    // MATLAB writes -v7.3 for >2 GB variables: same 128-byte text
    // header (version 0x0200), HDF5 superblock at offset 512, arrays
    // stored TRANSPOSED (HDF5 row-major = MATLAB column-major).
    // A 2x3 MATLAB matrix [[1,3,5],[2,4,6]]:
    //   v5: dims [2,3], column-major payload 1..6
    //   v7.3: HDF5 dims [3,2], row-major payload 1..6 (same flat order)
    val colMajor = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)
    val v5 = MatFixture.matFile(
      MatFixture.matrix("scores", 6, Seq(2, 3),
        MatFixture.doubles(colMajor.toSeq), 9),
      MatFixture.charMatrix("ml_analyzed", "4.937"))
    val v73 = MatFixture.mat73File(H5Fixture.write(Seq(
      H5Fixture.F32Matrix("scores", 3, 2, colMajor.map(_.toFloat)),
      H5Fixture.VStr("ml_analyzed", Array("4.937")))))
    val a = MatSource.parse(v5)
    val b = MatSource.parse(v73)
    assert(a.keySet == b.keySet)
    val MatSource.MatNum(d5, x5) = a("scores"): @unchecked
    val MatSource.MatNum(d73, x73) = b("scores"): @unchecked
    assert(d5 == Seq(2, 3) && d73 == Seq(2, 3))
    assert(x5.toSeq == x73.toSeq)
    assert(a("ml_analyzed") == b("ml_analyzed"))
    // an unknown header version rejects loudly, naming the field
    val bad = v73.clone(); bad(125) = 3
    val e = intercept[IllegalArgumentException] { MatSource.parse(bad) }
    assert(e.getMessage.contains("header version"), e.getMessage)
  }

  test("MAT v7.3 real-MATLAB shapes: uint16 char via MATLAB_class; cell rejects by name") {
    // real MATLAB stores char variables as uint16 code-unit datasets
    // typed by the MATLAB_class attribute — NOT HDF5 strings; decoding
    // them as numbers would silently empty every label consumer
    // (round-13 review). A MATLAB [1,5] char is HDF5 [5,1]; a MATLAB
    // [2,3] char matrix is HDF5 [3,2] with column-major flat order.
    val v73 = MatFixture.mat73File(H5Fixture.write(Seq(
      H5Fixture.U16Attr("ml_analyzed", Seq(5L, 1L),
        "4.937".map(_.toInt).toArray, "char"),
      H5Fixture.U16Attr("grid", Seq(3L, 2L),
        "adbecf".map(_.toInt).toArray, "char"), // col-major of [[a,b,c],[d,e,f]]
      H5Fixture.U16Attr("codes", Seq(3L, 1L),
        Array(7, 8, 9), "uint16"))))
    val vars = MatSource.parse(v73)
    assert(vars("ml_analyzed") == MatSource.MatStr("4.937"))
    assert(vars("grid") == MatSource.MatStr("abcdef"))
    val MatSource.MatNum(cd, cv) = vars("codes"): @unchecked
    assert(cd == Seq(1, 3) && cv.toSeq == Seq(7.0, 8.0, 9.0))
    // MATLAB_empty=1: the dataset holds the size vector, not data —
    // an empty variable reads as an empty value, not a tiny matrix of
    // its own dims (round-13 ADVICE item closed)
    val emptyV73 = MatFixture.mat73File(H5Fixture.write(Seq(
      H5Fixture.U16Attr("ml", Seq(2L, 1L), Array(0, 0), "double",
        matlabEmpty = true),
      H5Fixture.U16Attr("note", Seq(2L, 1L), Array(0, 0), "char",
        matlabEmpty = true))))
    val evars = MatSource.parse(emptyV73)
    val MatSource.MatNum(ed, ev) = evars("ml"): @unchecked
    assert(ed == Seq(0, 0) && ev.isEmpty, s"$ed ${ev.toSeq}")
    assert(evars("note") == MatSource.MatStr(""))
    // a variable CLAIMING cell class whose payload is not object
    // references is corruption, not data — reject loudly by name
    val cell = MatFixture.mat73File(H5Fixture.write(Seq(
      H5Fixture.U16Attr("classes", Seq(2L, 1L), Array(1, 2), "cell"))))
    val e = intercept[IllegalArgumentException] { MatSource.parse(cell) }
    assert(e.getMessage.contains("cell array"), e.getMessage)
    // MATLAB_class stored in an attribute MESSAGE version the reader
    // skips: the variable has attributes but none readable — refusing
    // the untyped numeric fallback, not silently reading a uint16 char
    // variable as numbers (round-13 ADVICE)
    val hidden = MatFixture.mat73File(H5Fixture.write(Seq(
      H5Fixture.U16Attr("label", Seq(2L, 1L), Array('h', 'i'),
        "char", attrVersion = 3))))
    val e2 = intercept[IllegalArgumentException] { MatSource.parse(hidden) }
    assert(e2.getMessage.contains("unsupported version 3"), e2.getMessage)
  }

  test("MAT v7.3 cellstr (object references into /#refs#) reads like its v5 twin") {
    // MATLAB auto-promotes big saves to -v7.3 and class lists are
    // cellstr by idiom (reference read sites:
    // code/annotations/ifcb_merge_classifiers.R:15-31,
    // compare_classlists.R:6-8) — a v7.3 class2use must parse
    // identically to the same list saved -v7
    val classes = Seq("Mesodinium_rubrum", "Dinophysis_acuminata", "unclassified")
    val v5 = MatFixture.matFile(MatFixture.cellOfStrings("class2use", classes))
    val v73 = MatFixture.cellstrV73("class2use", classes)
    val a = parse(v5)("class2use")
    val b = parse(v73)("class2use")
    assert(a == MatCell(Seq(3, 1), classes.map(MatStr)))
    assert(b == a, s"v7.3 read $b, v5 read $a")
    // and the relational view agrees end-to-end through Spark
    val dir = Files.createTempDirectory("mat73cell")
    Files.write(dir.resolve("class2use.mat"), v73)
    val got = MatSource.class2use(spark, dir.toString).orderBy("class_idx").collect()
    assert(got.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      classes.zipWithIndex.map { case (s, i) => (i + 1, s) })
  }
}
