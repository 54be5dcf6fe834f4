package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import graft.sources.{MatFixture, MatSource}

/** [[ManualMerge]] over real MAT-5 binary fixtures (written by
  * [[MatFixture]], read back through [[MatSource]]): class-list
  * reconciliation, index remapping, conflict surfacing and policies.
  */
class ManualMergeSpec extends SparkSpec {
  import MatFixture._

  // base: 3 classes; add: overlaps on unclassified/Mesodinium, brings
  // Dinophysis. One sample (D20240102...) is annotated in BOTH sets.
  private val baseClasses = Seq("unclassified", "Mesodinium", "Skeletonema")
  private val addClasses = Seq("unclassified", "Dinophysis", "Mesodinium")

  private def classlistFile(rows: Seq[(Double, Double, Double)]): Array[Byte] = {
    val n = rows.length
    val colMajor = rows.map(_._1) ++ rows.map(_._2) ++ rows.map(_._3)
    matFile(numMatrix("classlist", n, 3, colMajor),
      cellOfStrings("class2use_manual", baseClasses))
  }

  private def writeFixtures(): (String, String, String, String) = {
    val c2uBase = Files.createTempDirectory("c2u_base")
    Files.write(c2uBase.resolve("class2use_Base.mat"),
      matFile(cellOfStrings("class2use", baseClasses)))
    val c2uAdd = Files.createTempDirectory("c2u_add")
    Files.write(c2uAdd.resolve("class2use_Add.mat"),
      matFile(cellOfStrings("class2use", addClasses)))

    val manBase = Files.createTempDirectory("man_base")
    // rois 1..3: Mesodinium(2), Skeletonema(3), unannotated (NaN)
    Files.write(manBase.resolve("D20240101T000000_IFCB134.mat"),
      classlistFile(Seq((1, 2, Double.NaN), (2, 3, Double.NaN),
        (3, Double.NaN, Double.NaN))))
    // the conflicted sample, base's version: roi 1 → Skeletonema(3)
    Files.write(manBase.resolve("D20240102T000000_IFCB134.mat"),
      classlistFile(Seq((1, 3, Double.NaN))))

    val manAdd = Files.createTempDirectory("man_add")
    // add indices: Dinophysis=2, Mesodinium=3 in ITS OWN list
    Files.write(manAdd.resolve("D20240103T000000_IFCB134.mat"),
      classlistFile(Seq((1, 2, Double.NaN), (2, 3, Double.NaN))))
    // the conflicted sample, add's version: roi 1 → Dinophysis(2)
    Files.write(manAdd.resolve("D20240102T000000_IFCB134.mat"),
      classlistFile(Seq((1, 2, Double.NaN))))
    (c2uBase.toString, c2uAdd.toString, manBase.toString, manAdd.toString)
  }

  test("class lists reconcile by name; addition's indices remap; conflicts surface") {
    val (c2uBaseDir, c2uAddDir, manBaseDir, manAddDir) = writeFixtures()
    val merged = ManualMerge.merge(
      MatSource.class2use(spark, c2uBaseDir),
      MatSource.class2use(spark, c2uAddDir),
      MatSource.manualClassList(spark, manBaseDir),
      MatSource.manualClassList(spark, manAddDir))

    // base indices intact, Dinophysis appended at 4
    val classes = merged.class2use.collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(classes == Map(1 -> "unclassified", 2 -> "Mesodinium",
      3 -> "Skeletonema", 4 -> "Dinophysis"))

    // the conflicted sample is reported with both sides' row counts
    val conflicts = merged.conflicts.collect()
    assert(conflicts.length == 1)
    assert(conflicts.head.getAs[String]("sample") == "D20240102T000000_IFCB134")

    val ann = merged.annotations.collect()
      .map(r => (r.getAs[String]("sample"), r.getAs[Int]("roi_number")) ->
        (Option(r.get(2)), Option(r.getAs[String]("class_name")))).toMap
    // base rows untouched (unannotated ROI keeps null class)
    assert(ann(("D20240101T000000_IFCB134", 1)) == (Some(2), Some("Mesodinium")))
    assert(ann(("D20240101T000000_IFCB134", 3)) == (None, None))
    // addition remapped: its Mesodinium(3) → merged 2, Dinophysis(2) → merged 4
    assert(ann(("D20240103T000000_IFCB134", 1)) == (Some(4), Some("Dinophysis")))
    assert(ann(("D20240103T000000_IFCB134", 2)) == (Some(2), Some("Mesodinium")))
    // BaseWins (default): the conflicted sample keeps base's Skeletonema
    assert(ann(("D20240102T000000_IFCB134", 1)) == (Some(3), Some("Skeletonema")))
  }

  test("AddWins keeps the addition's conflicted rows; Fail throws") {
    val (c2uBaseDir, c2uAddDir, manBaseDir, manAddDir) = writeFixtures()
    val c2uBase = MatSource.class2use(spark, c2uBaseDir)
    val c2uAdd = MatSource.class2use(spark, c2uAddDir)
    val annBase = MatSource.manualClassList(spark, manBaseDir)
    val annAdd = MatSource.manualClassList(spark, manAddDir)

    val addWins = ManualMerge.merge(c2uBase, c2uAdd, annBase, annAdd,
      ManualMerge.AddWins)
    val conflicted = addWins.annotations
      .filter(org.apache.spark.sql.functions.col("sample") ===
        "D20240102T000000_IFCB134").collect()
    assert(conflicted.length == 1)
    assert(conflicted.head.getAs[String]("class_name") == "Dinophysis")

    val e = intercept[IllegalArgumentException] {
      ManualMerge.merge(c2uBase, c2uAdd, annBase, annAdd, ManualMerge.Fail)
    }
    assert(e.getMessage.contains("annotated in both"))
  }

  test("correctAnnotation relabels only the selected (sample, roi) pairs") {
    import spark.implicits._
    val manual = Seq(
      ("D20160805T065357_IFCB10", 1, Some(7), Some(7)),
      ("D20160805T065357_IFCB10", 2, Some(7), Some(9)),
      ("D20160805T065357_IFCB10", 3, None, Some(9)), // unannotated, selected
      ("D20160805T070000_IFCB10", 1, Some(7), None))
      .map { case (s, r, m, a) =>
        (s, r, m.map(Int.box).orNull, a.map(Int.box).orNull) }
      .toDF("sample", "roi_number", "manual_idx", "auto_idx")
    val selected = Seq(
      "D20160805T065357_IFCB10_00001.png",
      "D20160805T065357_IFCB10_00003.png",
      " D20160805T065357_IFCB10_00001.png", // dup + whitespace collapse
      "") // blank rows (trailing-newline artifacts) are tolerated
      .toDF("image_filename")
    val out = ManualMerge
      .correctAnnotation(manual, selected, "image_filename", newIdx = 44)
      .orderBy("sample", "roi_number")
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))
    assert(out.toSeq == Seq(
      ("D20160805T065357_IFCB10", 1, 44, 7), // relabeled
      ("D20160805T065357_IFCB10", 2, 7, 9), // untouched
      ("D20160805T065357_IFCB10", 3, 44, 9), // unannotated -> annotated
      ("D20160805T070000_IFCB10", 1, 7, -1))) // other sample untouched
  }

  test("correctAnnotation rejects unparseable image names loudly (round-13)") {
    import spark.implicits._
    val manual = Seq(("D20160805T065357_IFCB10", 1, Int.box(7), Int.box(7)))
      .toDF("sample", "roi_number", "manual_idx", "auto_idx")
    // a typo'd filename silently skipped = the curator's correction
    // silently lost — the fix makes it throw, naming the offender
    val selected = Seq(
      "D20160805T065357_IFCB10_00001.png",
      "not_a_roi_name").toDF("image_filename")
    val e = intercept[IllegalArgumentException] {
      ManualMerge.correctAnnotation(manual, selected, "image_filename", 44)
    }
    assert(e.getMessage.contains("not_a_roi_name"), e.getMessage)
  }

  test("correctAnnotation rejects parseable selections matching no manual row (round-14)") {
    import spark.implicits._
    val manual = Seq(("D20160805T065357_IFCB10", 1, Int.box(7), Int.box(7)))
      .toDF("sample", "roi_number", "manual_idx", "auto_idx")
    // a path-prefixed or wrong-dataset name parses FINE, joins to
    // nothing, and the correction used to vanish silently — the same
    // lost-correction class as an unparseable name, one step later
    val selected = Seq(
      "D20160805T065357_IFCB10_00001.png",
      "subdir/D20160805T065357_IFCB10_00001.png").toDF("image_filename")
    val e = intercept[IllegalArgumentException] {
      ManualMerge.correctAnnotation(manual, selected, "image_filename", 44)
    }
    assert(e.getMessage.contains("match no manual row"), e.getMessage)
  }

  test("dangling base manual_idx surfaces as null class, not an appended class's name (round-13)") {
    val (c2uBaseDir, c2uAddDir, manBaseDir, manAddDir) = writeFixtures()
    // corrupt base row: manual_idx 4 does not exist in the BASE list
    // (1..3) but the merge appends Dinophysis AT index 4 — the old
    // merged-list join silently labeled the dangling row "Dinophysis"
    import spark.implicits._
    val danglingBase = MatSource.manualClassList(spark, manBaseDir)
      .unionByName(Seq(("D20240101T000000_IFCB134", 99, Int.box(4), null: Integer))
        .toDF("sample", "roi_number", "manual_idx", "auto_idx"))
    val merged = ManualMerge.merge(
      MatSource.class2use(spark, c2uBaseDir),
      MatSource.class2use(spark, c2uAddDir),
      danglingBase,
      MatSource.manualClassList(spark, manAddDir))
    val row = merged.annotations
      .filter(org.apache.spark.sql.functions.col("sample") === "D20240101T000000_IFCB134" &&
        org.apache.spark.sql.functions.col("roi_number") === 99)
      .collect().head
    assert(row.getAs[Integer]("manual_idx") == 4)
    assert(row.getAs[String]("class_name") == null,
      s"dangling idx acquired '${row.getAs[String]("class_name")}'")
  }
}
