package graft.sources

import java.nio.file.Files
import graft.SparkSpec

/** S8 dashboard-REST snapshot tooling: URL construction mirrors
  * helpers.R:21-107; parsers turn saved responses into frames.
  */
class DashboardSnapshotSpec extends SparkSpec {

  test("metadata and bin-list URLs match the reference API shape") {
    assert(DashboardSnapshot.metadataUrl("https://ifcb-data.example.org/") ==
      "https://ifcb-data.example.org/api/export_metadata/")
    // %20, not '+': the slug is a path segment and the reference uses
    // utils::URLencode(reserved = TRUE) (helpers.R:29), which
    // percent-encodes — the old '+' expectation pinned a form-encoding
    // bug (round-11 review)
    assert(DashboardSnapshot.metadataUrl(
      "https://ifcb-data.example.org", Some("RV Svea")) ==
      "https://ifcb-data.example.org/api/export_metadata/RV%20Svea")
    assert(DashboardSnapshot.binListUrl("https://x.org//") ==
      "https://x.org/api/list_bins")
  }

  test("parseMetadata reads a saved export_metadata CSV response") {
    val dir = Files.createTempDirectory("dash")
    Files.writeString(dir.resolve("resp.csv"),
      """pid,latitude,longitude,comment_summary
        |D20240601T100000_IFCB134,57.0,16.0,
        |D20240601T110000_IFCB134,57.7,11.0,"GPS location originates from ferrybox data"
        |""".stripMargin)
    val df = DashboardSnapshot.parseMetadata(spark, dir.toString)
    assert(df.count() == 2)
    val commented = df.filter(
      org.apache.spark.sql.functions.col("comment_summary").isNotNull)
    assert(commented.count() == 1)
    assert(commented.head().getAs[String]("pid") == "D20240601T110000_IFCB134")
  }

  test("parseBinList reads wrapped and bare JSON responses") {
    val dir = Files.createTempDirectory("dashbins")
    Files.writeString(dir.resolve("a.json"),
      """{"bins": [{"pid": "D20240601T100000_IFCB134", "sample_time": "2024-06-01T10:00:00", "instrument": "IFCB134"}]}""")
    Files.writeString(dir.resolve("b.json"),
      """[{"pid": "D20240601T110000_IFCB134"}]""")
    val df = DashboardSnapshot.parseBinList(spark, dir.toString)
    val pids = df.select("pid").collect().map(_.getString(0)).toSet
    assert(pids == Set(
      "D20240601T100000_IFCB134", "D20240601T110000_IFCB134"))
  }
}
