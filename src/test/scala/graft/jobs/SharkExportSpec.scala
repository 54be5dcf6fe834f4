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
