package graft.jobs

import graft.SparkSpec

/** [[WhoiCuration]] golden fixture: day-of-year id synthesis, canonical
  * renames, folder-derived class list, bulk annotation with the
  * unclassified fill.
  */
class WhoiCurationSpec extends SparkSpec {
  import spark.implicits._

  private val paths = Seq(
    // day 188 of 2014 = 2014-07-07 (181 days through June + 7)
    "/data/png/diatom/IFCB1_2014_188_222013_42.png",
    "/data/png/diatom/IFCB1_2014_188_222013_43.png",
    "/data/png/ciliate/IFCB5_2016_060_010203_7.png", // leap year: day 60 = Feb 29
    // 4-digit instrument + 6-digit roi: must pad-without-truncate
    "/data/png/ciliate/IFCB1234_2015_001_000000_123456.png",
    "/data/png/ciliate/not_a_legacy_name.png",
    // matches the legacy pattern but encodes hour 25: not a timestamp —
    // must drop like the unknown-format branch, not crash under ANSI
    // (round-12 review)
    "/data/png/diatom/IFCB1_2014_188_256090_99.png"
  ).toDF("path")

  test("legacy names parse to samples, dates and canonical renames") {
    val parsed = WhoiCuration.parseLegacyPngs(paths).collect()
      .map(r => r.getAs[Int]("roi") -> r).toMap
    assert(parsed.size == 4) // malformed name AND invalid-clock name drop
    val r42 = parsed(42)
    assert(r42.getAs[String]("sample") == "IFCB1_2014_188_222013")
    assert(r42.getAs[java.sql.Date]("date").toString == "2014-07-07")
    assert(r42.getAs[java.sql.Timestamp]("timestamp").toString ==
      "2014-07-07 22:20:13.0")
    assert(r42.getAs[String]("canonical_name") ==
      "I20140707T222013_IFCB001_00042.png")
    val r7 = parsed(7)
    assert(r7.getAs[java.sql.Date]("date").toString == "2016-02-29")
    assert(r7.getAs[String]("canonical_name") ==
      "I20160229T010203_IFCB005_00007.png")
    // wider-than-pad fields keep all their digits (sprintf semantics)
    assert(parsed(123456).getAs[String]("canonical_name") ==
      "I20150101T000000_IFCB1234_123456.png")
  }

  test("class list from folders: unclassified first, observed classes alphabetical") {
    val c2u = WhoiCuration.class2useFromFolders(
        WhoiCuration.parseLegacyPngs(paths))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(c2u == Map(1 -> "unclassified", 2 -> "ciliate", 3 -> "diatom"))
  }

  test("bulk annotation labels png rois, fills the rest with unclassified") {
    val parsed = WhoiCuration.parseLegacyPngs(paths)
    val c2u = WhoiCuration.class2useFromFolders(parsed)
    // ADC inventory: the diatom sample has rois 42, 43 and an extra 44;
    // an untouched sample never appears in the output
    val adc = Seq(
      ("IFCB1_2014_188_222013", 42), ("IFCB1_2014_188_222013", 43),
      ("IFCB1_2014_188_222013", 44),
      ("IFCB5_2016_060_010203", 7),
      ("IFCB9_2014_001_000000", 1)
    ).toDF("sample", "roi_number")
    val ann = WhoiCuration.annotateBatch(parsed, c2u, adc).collect()
      .map(r => (r.getAs[String]("sample"), r.getAs[Int]("roi_number")) ->
        (r.getAs[Int]("manual_idx"), r.getAs[String]("class_name"))).toMap
    assert(ann == Map(
      ("IFCB1_2014_188_222013", 42) -> (3, "diatom"),
      ("IFCB1_2014_188_222013", 43) -> (3, "diatom"),
      ("IFCB1_2014_188_222013", 44) -> (1, "unclassified"),
      ("IFCB5_2016_060_010203", 7) -> (2, "ciliate")))
    // the IFCB1234 annotation has NO inventory row: absent above by
    // classlist-shape necessity, but it must surface as an orphan, not
    // vanish — an incomplete ADC inventory otherwise reads as "fewer
    // labels"
    val orphans = WhoiCuration.annotationOrphans(parsed, c2u, adc)
      .collect().map(r => (r.getAs[String]("sample"), r.getAs[Int]("roi_number")))
    assert(orphans.toSeq == Seq(("IFCB1234_2015_001_000000", 123456)))
    // healthy inventory: no orphans
    val full = adc.unionByName(
      Seq(("IFCB1234_2015_001_000000", 123456)).toDF("sample", "roi_number"))
    assert(WhoiCuration.annotationOrphans(parsed, c2u, full).isEmpty)
  }

  test("a png under two class folders resolves to ONE label, last-alphabetical wins") {
    // round-12 review: conflicting folders used to fan the ADC row out
    // to two contradictory label rows; the reference's sequential
    // annotate overwrites in folder-listing order, so the
    // lexicographically greatest class wins deterministically
    val dup = Seq(
      "/data/png/diatom/IFCB1_2014_188_222013_42.png",
      "/data/png/ciliate/IFCB1_2014_188_222013_42.png"
    ).toDF("path")
    val parsed = WhoiCuration.parseLegacyPngs(dup)
    val c2u = WhoiCuration.class2useFromFolders(parsed)
    val adc = Seq(("IFCB1_2014_188_222013", 42)).toDF("sample", "roi_number")
    val ann = WhoiCuration.annotateBatch(parsed, c2u, adc).collect()
    assert(ann.length == 1, "one label per (sample, roi)")
    assert(ann.head.getAs[String]("class_name") == "diatom")
  }

  test("curation round-trip: annotateBatch writes manual .mat files the reader parses") {
    // the write side the reference's ifcb_annotate_batch performs
    // (annotate_whoi_data.R:64-73): one manual file per touched sample,
    // read back bit-compatibly by MatSource.manualClassList
    val parsed = WhoiCuration.parseLegacyPngs(paths)
    val c2u = WhoiCuration.class2useFromFolders(parsed)
    val adc = Seq(
      ("IFCB1_2014_188_222013", 42), ("IFCB1_2014_188_222013", 43),
      ("IFCB1_2014_188_222013", 44),
      ("IFCB5_2016_060_010203", 7)
    ).toDF("sample", "roi_number")
    val ann = WhoiCuration.annotateBatch(parsed, c2u, adc)
    val classes = c2u.orderBy("class_idx")
      .collect().map(_.getString(1)).toSeq
    val dir = java.nio.file.Files.createTempDirectory("manual_out")
    graft.sources.MatSink.writeManualFiles(ann, classes, dir.toString)
    val files = new java.io.File(dir.toString).list().sorted
    assert(files.toSeq ==
      Seq("IFCB1_2014_188_222013.mat", "IFCB5_2016_060_010203.mat"))
    val back = graft.sources.MatSource.manualClassList(spark, dir.toString)
      .collect()
      .map(r => (r.getAs[String]("sample"), r.getAs[Int]("roi_number")) ->
        r.getAs[Integer]("manual_idx")).toMap
    assert(back == Map(
      ("IFCB1_2014_188_222013", 42) -> (3: Integer),
      ("IFCB1_2014_188_222013", 43) -> (3: Integer),
      ("IFCB1_2014_188_222013", 44) -> (1: Integer),
      ("IFCB5_2016_060_010203", 7) -> (2: Integer)))
    // the class list travels WITH each manual file (class2use_manual),
    // so indices stay resolvable without the config file
    val one = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.toString, "IFCB5_2016_060_010203.mat"))
    val vars = graft.sources.MatSource.parse(one)
    val graft.sources.MatSource.MatCell(_, items) =
      vars("class2use_manual"): @unchecked
    assert(items.map { case graft.sources.MatSource.MatStr(s) => s; case _ => "?" } ==
      Seq("unclassified", "ciliate", "diatom"))
  }

  test("writeManualFiles rejects conflicting labels for one ROI loudly") {
    // round-12 ADVICE: annotateBatch dedups upstream, but this public
    // entry point must not silently ship a classlist carrying two
    // contradictory rows for the same (sample, roi_number)
    import org.apache.spark.sql.functions.col
    val conflicting = Seq(
      ("IFCB1_2014_188_222013", 42, 1),
      ("IFCB1_2014_188_222013", 42, 2),
      ("IFCB1_2014_188_222013", 43, 1)
    ).toDF("sample", "roi_number", "manual_idx")
      .select(col("sample"), col("roi_number"), col("manual_idx"))
    val dir = java.nio.file.Files.createTempDirectory("manual_dup")
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.MatSink.writeManualFiles(conflicting,
        Seq("unclassified", "a", "b"), dir.toString)
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg != null && msg.contains("conflicting labels"), msg)
    assert(new java.io.File(dir.toString).list().isEmpty,
      "no manual file may be published from a conflicting batch")
    // AGREEING duplicates (idempotent replay unioning overlapping
    // batches) are not conflicts: they collapse and the write succeeds
    val agreeing = Seq(
      ("IFCB1_2014_188_222013", 42, 1),
      ("IFCB1_2014_188_222013", 42, 1),
      ("IFCB1_2014_188_222013", 43, 2)
    ).toDF("sample", "roi_number", "manual_idx")
    val dir2 = java.nio.file.Files.createTempDirectory("manual_replay")
    graft.sources.MatSink.writeManualFiles(agreeing,
      Seq("unclassified", "a", "b"), dir2.toString)
    val back = graft.sources.MatSource.manualClassList(spark, dir2.toString)
      .collect().map(r => r.getAs[Int]("roi_number") ->
        r.getAs[Integer]("manual_idx")).toMap
    assert(back == Map(42 -> (1: Integer), 43 -> (2: Integer)))
  }
}
