package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** H5Source against generated spec-faithful fixtures: raw parse of every
  * supported datatype/layout combination, then the classScores relational
  * view end to end through Spark.
  */
class H5SourceSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: Array[Byte] = H5Fixture.write(Seq(
    H5Fixture.VStr("classifier_name", Array("cnn_v4")),
    H5Fixture.VStr("class_labels", Array("Mesodinium_rubrum", "Dinophysis_acuminata", "other")),
    H5Fixture.I32("roi_numbers", Array(3, 7, 12, 20)),
    H5Fixture.F64("thresholds", Array(0.9, 0.75, 0.5)),
    H5Fixture.F32Matrix("output_scores", 4, 3, Array(
      0.95f, 0.03f, 0.02f,
      0.10f, 0.85f, 0.05f,
      0.20f, 0.30f, 0.50f,
      0.40f, 0.70f, 0.10f))))

  test("parse reads every dataset type: vlen strings, i32, f64, chunked+deflate f32") {
    val vars = H5Source.parse(fixture)
    assert(vars.keySet == Set("classifier_name", "class_labels", "roi_numbers",
      "thresholds", "output_scores"))
    val H5Source.H5Str(_, names) = vars("classifier_name"): @unchecked
    assert(names.toSeq == Seq("cnn_v4"))
    val H5Source.H5Str(_, labels) = vars("class_labels"): @unchecked
    assert(labels.toSeq == Seq("Mesodinium_rubrum", "Dinophysis_acuminata", "other"))
    val H5Source.H5Num(_, rois) = vars("roi_numbers"): @unchecked
    assert(rois.toSeq == Seq(3.0, 7.0, 12.0, 20.0))
    val H5Source.H5Num(_, th) = vars("thresholds"): @unchecked
    assert(th.toSeq == Seq(0.9, 0.75, 0.5))
    val H5Source.H5Num(dims, scores) = vars("output_scores"): @unchecked
    assert(dims == Seq(4L, 3L))
    assert(math.abs(scores(0) - 0.95) < 1e-6 && math.abs(scores(4) - 0.85) < 1e-6)
  }

  test("object-header continuation blocks are followed") {
    val bytes = H5Fixture.write(Seq(
      H5Fixture.I32("rois", Array(5, 6, 7), splitHeader = true)))
    val H5Source.H5Num(_, vals) = H5Source.parse(bytes)("rois"): @unchecked
    assert(vals.toSeq == Seq(5.0, 6.0, 7.0))
  }

  test("continuation bounds reject when addr+len overflows Long (round-16)") {
    // ca and cs each near 2^62 are individually positive and ca+cs
    // wraps NEGATIVE, so the old `ca + cs <= limit` guard passed and
    // ca.toInt silently parsed unrelated in-file bytes as messages —
    // the exact class the bound was added to close
    val bytes = H5Fixture.write(Seq(
      H5Fixture.I32("rois", Array(5, 6, 7), splitHeader = true)))
    // locate the continuation message: type 0x0010, size 16, zero flags
    val pat = Array[Byte](0x10, 0x00, 0x10, 0x00, 0x00, 0x00, 0x00, 0x00)
    val at = bytes.indices.indexWhere(i => i + 24 <= bytes.length &&
      pat.indices.forall(j => bytes(i + j) == pat(j)))
    assert(at >= 0, "continuation message not found in fixture")
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(at + 8, 0x4000000000000000L + 64L)  // address
    b.putLong(at + 16, 0x4000000000000000L)       // length
    val e = intercept[IllegalArgumentException](H5Source.parse(bytes))
    assert(e.getMessage.contains("continuation block"), e.getMessage)
  }

  test("multi-chunk datasets reassemble correctly (2-row chunks, edge padding)") {
    val vals = Array.tabulate(5 * 3)(_.toFloat)
    val bytes = H5Fixture.write(Seq(
      H5Fixture.F32Matrix("scores", 5, 3, vals, chunkRows = 2)))
    val H5Source.H5Num(dims, data) = H5Source.parse(bytes)("scores"): @unchecked
    assert(dims == Seq(5L, 3L))
    assert(data.map(_.toFloat).sameElements(vals))
  }

  test("shuffle+deflate filter pipeline round-trips (h5py/Keras default)") {
    // shuffle (id 2) listed before deflate in the pipeline message =
    // write application order; the reader must inflate FIRST, then
    // byte-transpose back — applying them in listed order (or skipping
    // shuffle) decodes garbage floats, not an error
    val vals = Array.tabulate(5 * 3)(i => (i * 1.25f) - 4f)
    val bytes = H5Fixture.write(Seq(
      H5Fixture.F32Matrix("scores", 5, 3, vals, chunkRows = 2, shuffle = true)))
    val H5Source.H5Num(dims, data) = H5Source.parse(bytes)("scores"): @unchecked
    assert(dims == Seq(5L, 3L))
    assert(data.map(_.toFloat).sameElements(vals))
  }

  test("fletcher32(+shuffle+deflate) pipeline verifies and strips the chunk checksums") {
    // fletcher32 (id 3) listed LAST = applied after deflate on write
    // (h5py's fletcher32=True); the reader must verify + strip the
    // 4-byte trailing checksum FIRST, then inflate, then un-shuffle —
    // treating the checksum as data would corrupt the inflate input
    val vals = Array.tabulate(5 * 3)(i => (i * 2.5f) - 7f)
    val bytes = H5Fixture.write(Seq(
      H5Fixture.F32Matrix("scores", 5, 3, vals, chunkRows = 2,
        shuffle = true, fletcher32 = true)))
    val H5Source.H5Num(dims, data) = H5Source.parse(bytes)("scores"): @unchecked
    assert(dims == Seq(5L, 3L))
    assert(data.map(_.toFloat).sameElements(vals))
    // fletcher32 without shuffle too (deflate+fletcher32 only)
    val bytes2 = H5Fixture.write(Seq(
      H5Fixture.F32Matrix("scores", 4, 2, vals.take(8), fletcher32 = true)))
    val H5Source.H5Num(_, data2) = H5Source.parse(bytes2)("scores"): @unchecked
    assert(data2.map(_.toFloat).sameElements(vals.take(8)))
  }

  test("per-chunk filter mask: raw-stored chunks of an optional-deflate pipeline decode") {
    // libhdf5 stores an incompressible chunk RAW and sets the skipped
    // filter's bit in the chunk key's 4-byte mask; inflating those raw
    // bytes rejects a valid file (round-13 review)
    val vals = Array.tabulate(5 * 3)(i => i * 0.5f)
    val bytes = H5Fixture.write(Seq(
      H5Fixture.F32Matrix("raw", 5, 3, vals, chunkRows = 2, rawChunks = true),
      H5Fixture.F32Matrix("rawshuf", 5, 3, vals, chunkRows = 2,
        shuffle = true, rawChunks = true),
      H5Fixture.F32Matrix("comp", 5, 3, vals, chunkRows = 2)))
    val parsed = H5Source.parse(bytes)
    for (n <- Seq("raw", "rawshuf", "comp")) {
      val H5Source.H5Num(dims, data) = parsed(n): @unchecked
      assert(dims == Seq(5L, 3L), n)
      assert(data.map(_.toFloat).sameElements(vals), n)
    }
  }

  test("unwritten chunked dataset (undefined B-tree) reads as fill-value zeros") {
    // chunks allocate lazily: a created-but-never-written dataset has
    // an undefined B-tree address and libhdf5 reads it as fill-value —
    // not a crash on a -1 buffer index (round-13 review)
    val bytes = H5Fixture.write(Seq(H5Fixture.F32Matrix(
      "empty", 4, 3, Array.fill(12)(9f), chunkRows = 2, unwritten = true)))
    val H5Source.H5Num(dims, data) = H5Source.parse(bytes)("empty"): @unchecked
    assert(dims == Seq(4L, 3L))
    assert(data.forall(_ == 0.0), data.toSeq)
  }

  test("contiguous data address past EOF fires the extent diagnostic") {
    // round-11 advice: the guard checked only n <= file size, so an
    // in-range SIZE with an out-of-range ADDRESS read past the buffer
    // and died with a raw IndexOutOfBounds message instead of the
    // intended diagnostic. Patch the layout message's dataAddr to
    // EOF - 2 (extent then overhangs by n - 2 bytes).
    val values = Array(5, 6, 7, 8, 9, 10, 11)
    val bytes = H5Fixture.write(Seq(H5Fixture.I32("rois", values)))
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = 4L * values.length
    // locate the contiguous layout body: version 3, class 1, addr, size=n
    val at = (96 until bytes.length - 18).find { p =>
      bytes(p) == 3 && bytes(p + 1) == 1 && bb.getLong(p + 10) == n
    }.getOrElse(fail("layout message not found in fixture bytes"))
    bb.putLong(at + 2, bytes.length - 2L)
    val e = intercept[IllegalArgumentException] { H5Source.parse(bytes) }
    assert(e.getMessage.contains("contiguous data extent"),
      s"wrong diagnostic: ${e.getMessage}")
  }

  test("classScores view: long form with labels, thresholds, classifier") {
    val dir = Files.createTempDirectory("h5src").toFile
    Files.write(Paths.get(dir.toString, "D20230801T120000_IFCB134_class.h5"), fixture)
    val df = H5Source.classScores(spark, dir.toString)
    assert(df.count() == 12) // 4 ROIs x 3 classes
    val row = df.filter($"roi_number" === 7 && $"class_name" === "Dinophysis_acuminata")
      .select("sample", "classifier", "score", "threshold")
      .as[(String, String, Double, Double)].collect().head
    assert(row._1 == "D20230801T120000_IFCB134")
    assert(row._2 == "cnn_v4")
    assert(math.abs(row._3 - 0.85) < 1e-6)
    assert(row._4 == 0.75)
  }

  test("topClassPerRoi applies the per-class threshold gate") {
    val dir = Files.createTempDirectory("h5src2").toFile
    Files.write(Paths.get(dir.toString, "D20230801T120000_IFCB134_class.h5"), fixture)
    val top = H5Source.topClassPerRoi(H5Source.classScores(spark, dir.toString))
    val byRoi = top.select("roi_number", "class_name", "class_above_threshold")
      .as[(Int, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byRoi(3) == (("Mesodinium_rubrum", "Mesodinium_rubrum")))   // 0.95 >= 0.9
    assert(byRoi(7) == (("Dinophysis_acuminata", "Dinophysis_acuminata"))) // 0.85 >= 0.75
    assert(byRoi(12) == (("other", "other")))                          // 0.50 >= 0.5
    assert(byRoi(20) == (("Dinophysis_acuminata", "unclassified")))    // 0.70 < 0.75
  }

  test("topClassPerRoi: a NaN score neither wins the window nor passes the gate") {
    // round-14 review: Spark orders NaN as the LARGEST double, so a
    // failed-feature NaN score ranked FIRST under score.desc and
    // nanSafeCompare made `NaN >= threshold` true — the ROI was
    // delivered as that class "above threshold"
    import spark.implicits._
    val scores = Seq(
      (s, "c1", 1, "A", Double.NaN, 0.5),  // NaN must not win
      (s, "c1", 1, "B", 0.6, 0.5),         // the real winner
      (s, "c1", 2, "A", Double.NaN, 0.5),  // all-NaN ROI: unclassified
      (s, "c1", 2, "B", Double.NaN, 0.5)
    ).toDF("sample", "classifier", "roi_number", "class_name", "score", "threshold")
    val top = H5Source.topClassPerRoi(scores)
      .select("roi_number", "class_name", "class_above_threshold")
      .as[(Int, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(top(1) == (("B", "B")), top(1))
    assert(top(2)._2 == "unclassified", top(2))
  }

  private val s = "D20230801T120000_IFCB134"
}
