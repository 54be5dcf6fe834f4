package graft.jobs

import java.nio.file.Files
import graft.SparkSpec

/** End-to-end flagship job on a hand-built fixture: rollup math, flag
  * filter (P4 substring), W1 adjacency drop, delivery projection, K1 sink.
  */
class SharkExportSpec extends SparkSpec {
  import spark.implicits._

  test("delivery pipeline composes rollup, QC, adjacency and projection") {
    val roi = Seq(
      ("S1", "algae", 1000.0, false), ("S1", "algae", 2000.0, false),
      ("S2", "diatom", 500.0, true),
      ("S3", "algae", 100.0, false),
      ("S4", "algae", 100.0, false),
      ("S5", "algae", 100.0, false)
    ).toDF("sample", "class_name", "vol_um3", "is_diatom")
    val dim = Seq(
      ("S1", 5.0, 57.0, 11.0), ("S2", 5.0, 57.0, 11.0), ("S3", 5.0, 57.0, 11.0),
      ("S4", 5.0, 57.0, 11.0), ("S5", 5.0, 57.0, 11.0)
    ).toDF("sample", "ml_analyzed", "lat", "lon")
    // S2 has beads (dropped by P4); S4 has bubbles (dropped + neighbors S3/S5)
    val flags = Seq(("S2", "beads"), ("S4", "Bubbles")).toDF("sample", "flag")

    // one instrument run → one explicit adjacency partition
    val out = SharkExport.delivery(roi, dim, flags,
      removeFlagged = Seq("beads", "bubbles"),
      adjacencyPartition = org.apache.spark.sql.functions.lit("run1"))
    val rows = out.collect().map(r => r.getAs[String]("SMPNO")).toSet
    assert(rows == Set("S1")) // S2 beads, S4 bubbles, S3/S5 adjacent
    val s1 = out.filter($"SMPNO" === "S1").collect().head
    assert(s1.getAs[Long]("COUNTNR") == 2L)
    assert(math.abs(s1.getAs[Double]("ABUND") - 400.0) < 1e-9) // 2/5ml*1000
    assert(math.abs(s1.getAs[Double]("BIOVOL") - 3e-6) < 1e-18)
  }

  test("a zero-volume sample nulls ABUND/C_CONC instead of crashing the delivery (ANSI)") {
    // round-12 review: IngestQc.sampleMetrics emits ml_analyzed = 0.0
    // for an aborted run (runTime == inhibitTime); ANSI division used
    // to abort the whole delivery on that one row
    val roi = Seq(("S1", "algae", 1000.0, false), ("S2", "algae", 500.0, false))
      .toDF("sample", "class_name", "vol_um3", "is_diatom")
    val dim = Seq(("S1", 0.0, 57.0, 11.0), ("S2", 5.0, 57.0, 11.0))
      .toDF("sample", "ml_analyzed", "lat", "lon")
    val flags = Seq.empty[(String, String)].toDF("sample", "flag")
    val out = SharkExport.delivery(roi, dim, flags, Nil,
      org.apache.spark.sql.functions.lit("run1")).collect()
      .map(r => r.getAs[String]("SMPNO") -> r).toMap
    assert(out("S1").getAs[Any]("ABUND") == null)
    assert(out("S1").getAs[Any]("C_CONC") == null)
    assert(math.abs(out("S2").getAs[Double]("ABUND") - 200.0) < 1e-9)
  }

  test("manual delivery from SQLite annotations unions with auto rows") {
    // annotations DB fixture: two annotators touch S6, the later one wins
    // the A5 analysis-date window (shark.R:268-277)
    val db = graft.sources.SqliteFixture.write("annotations",
      Seq("sample_name" -> "TEXT", "roi_number" -> "INTEGER",
        "class_name" -> "TEXT", "annotator" -> "TEXT", "timestamp" -> "TEXT"),
      Seq(
        Seq("S6", 1L, "diatom", "alice", "2024-06-02 10:00:00"),
        Seq("S6", 2L, "algae", "bob", "2024-06-03 09:00:00"),
        Seq("S7", 1L, "algae", "alice", "2024-06-02 11:00:00")))
    val dir = Files.createTempDirectory("anndb")
    Files.write(dir.resolve("ann.db"), db)
    val annotations = graft.sources.SqliteSource.annotations(spark, dir.toString)

    // kernel-shaped features: Biovolume in px³
    val features = Seq(
      ("S6", 1, 1000.0), ("S6", 2, 2000.0), ("S7", 1, 500.0)
    ).toDF("sample", "roi_number", "Biovolume")
    val diatomDim = Seq(("diatom", true), ("algae", false))
      .toDF("class_name", "is_diatom")
    val autoRoi = Seq(("S1", "algae", 1000.0, false))
      .toDF("sample", "class_name", "vol_um3", "is_diatom")
    val dim = Seq(("S1", 5.0, 57.0, 11.0), ("S6", 5.0, 57.0, 11.0),
      ("S7", 5.0, 57.0, 11.0)).toDF("sample", "ml_analyzed", "lat", "lon")
    val flags = Seq.empty[(String, String)].toDF("sample", "flag")

    val out = SharkExport.deliveryWithManual(
      autoRoi, annotations, features, diatomDim, dim, flags,
      removeFlagged = Nil,
      adjacencyPartition = org.apache.spark.sql.functions.lit("run1"))
      .collect()

    val byKey = out.map(r =>
      (r.getAs[String]("SMPNO"), r.getAs[String]("LATNM")) -> r).toMap
    assert(byKey.keySet == Set(
      ("S1", "algae"), ("S6", "diatom"), ("S6", "algae"), ("S7", "algae")))
    assert(byKey(("S1", "algae")).getAs[String]("VERIF") == "PredictedByMachine")
    val s6 = byKey(("S6", "diatom"))
    assert(s6.getAs[String]("VERIF") == "ValidatedByHuman")
    // last annotation on S6 is bob's (2024-06-03)
    assert(s6.getAs[String]("ANA_RESP") == "bob")
    assert(s6.getAs[java.sql.Date]("ANADATE").toString == "2024-06-03")
    // manual biovolume: px³ × (1/2.77)³, per-liter over 5 ml, µm³→mm³/L;
    // the rollup sums in DECIMAL(18,4) (order-independent), so the µm³
    // value is quantized at 1e-4 → ≤ 5e-14 here after the /1e9 scaling
    val mf3 = math.pow(1.0 / 2.77, 3)
    assert(math.abs(s6.getAs[Double]("BIOVOL") - 1000.0 * mf3 / 1e9) < 1e-13)
    assert(byKey(("S7", "algae")).getAs[String]("ANA_RESP") == "alice")
  }

  test("adjacency sorts the full run-sequence universe in BOTH branches (round-12)") {
    // run sequence S1(bubbles) S2 S3; only S1/S3 annotated. The manual
    // branch used to compute lag/lead over the annotated subset alone,
    // see S1,S3 as neighbors, and drop S3's ValidatedByHuman rows — a
    // clean sample two slots from the bubbles sample lost its manual
    // delivery while its machine rows survived
    val db = graft.sources.SqliteFixture.write("annotations",
      Seq("sample_name" -> "TEXT", "roi_number" -> "INTEGER",
        "class_name" -> "TEXT", "annotator" -> "TEXT", "timestamp" -> "TEXT"),
      Seq(
        Seq("S1", 1L, "algae", "alice", "2024-06-01 10:00:00"),
        Seq("S3", 1L, "algae", "alice", "2024-06-01 11:00:00")))
    val dir = Files.createTempDirectory("anndb2")
    Files.write(dir.resolve("ann.db"), db)
    val annotations = graft.sources.SqliteSource.annotations(spark, dir.toString)
    val features = Seq(("S1", 1, 100.0), ("S3", 1, 100.0))
      .toDF("sample", "roi_number", "Biovolume")
    val diatomDim = Seq(("algae", false)).toDF("class_name", "is_diatom")
    val autoRoi = Seq(
      ("S1", "algae", 10.0, false), ("S2", "algae", 10.0, false),
      ("S3", "algae", 10.0, false))
      .toDF("sample", "class_name", "vol_um3", "is_diatom")
    val dim = Seq(("S1", 5.0, 57.0, 11.0), ("S2", 5.0, 57.0, 11.0),
      ("S3", 5.0, 57.0, 11.0)).toDF("sample", "ml_analyzed", "lat", "lon")
    val flags = Seq(("S1", "bubbles")).toDF("sample", "flag")
    val out = SharkExport.deliveryWithManual(
      autoRoi, annotations, features, diatomDim, dim, flags,
      removeFlagged = Seq("bubbles"),
      adjacencyPartition = org.apache.spark.sql.functions.lit("run1"))
      .collect()
    val keys = out.map(r =>
      (r.getAs[String]("SMPNO"), r.getAs[String]("VERIF"))).toSet
    // S1 dropped (bubbles) and S2 dropped (adjacent) in both branches;
    // S3 survives in BOTH — S2 separates it from the bubbles sample
    assert(keys == Set(
      ("S3", "PredictedByMachine"), ("S3", "ValidatedByHuman")), keys.toString)
  }

  test("MYEAR decodes canonical IFCB sample ids, not only plain timestamps (round-11)") {
    import org.apache.spark.sql.functions.col
    // a bare try_to_timestamp can never parse D20230801T120000_IFCB134,
    // which silently nulled MYEAR for every real delivery row
    val got = Seq("D20230801T120000_IFCB134", "2024-02-03 04:05:06", "junk")
      .toDF("sample")
      .select(org.apache.spark.sql.functions.year(
        SharkExport.sampleTimestamp(col("sample"))).as("y"))
      .as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(2023), Some(2024), None), got.toString)
  }

  test("runOnSynthetic writes a TSV delivery and returns rows") {
    val out = Files.createTempDirectory("shark").resolve("delivery").toString
    val df = SharkExport.runOnSynthetic(spark, "/root/testdata/sf0.001", out)
    assert(df.count() > 0)
    val read = spark.read.option("sep", "\t").option("header", "true").csv(out)
    assert(read.count() == df.count())
    assert(read.columns.toSeq ==
      Seq("SMPNO", "LATIT", "LONGI", "LATNM", "COUNTNR", "ABUND", "BIOVOL", "C_CONC"))
  }
}
