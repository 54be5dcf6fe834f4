package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S8 SVEPA event snapshot: request manifest → saved responses → cruise
  * fill (reference loop at code/ifcb_ingest_and_qc.R:223-253).
  */
class SvepaSnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("requests renders the service's yyyyMMddHHmmss timestamp per unmatched bin") {
    val missing = Seq(
      ("D20240101T123000_IFCB134", java.sql.Timestamp.valueOf("2024-01-01 12:30:00")))
      .toDF("sample", "datetime")
    val req = SvepaSnapshot.requests(missing).collect().head
    assert(req.getAs[String]("platform") == "SVEA")
    assert(req.getAs[String]("timestamp") == "20240101123000")
  }

  test("parsed responses fill cruise_no only where the interval join missed") {
    val dir = Files.createTempDirectory("svepa")
    dir.toFile.deleteOnExit()
    Files.writeString(dir.resolve("responses.json"),
      """{"sample": "D20240101T123000_IFCB134", "id": "77-2024", "error": null}
        |{"sample": "D20240106T000000_IFCB134", "id": null, "error": "no event"}
        |""".stripMargin)
    val svepa = SvepaSnapshot.parseResponses(spark, dir.toString)
    val binCruises = Seq(
      // matched by the cruise intervals: svepa must NOT override
      ("D20240105T000000_IFCB134", java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), Some(12)),
      // unmatched, svepa knows the event
      ("D20240101T123000_IFCB134", java.sql.Timestamp.valueOf("2024-01-01 12:30:00"), None),
      // unmatched, svepa lookup failed -> stays null (renders "NA")
      ("D20240106T000000_IFCB134", java.sql.Timestamp.valueOf("2024-01-06 00:00:00"), None))
      .toDF("sample", "datetime", "cruise_no")
    val filled = SvepaSnapshot.resolveCruiseNo(binCruises, svepa)
      .select("sample", "cruise_no").as[(String, Option[String])]
      .collect().toMap
    assert(filled("D20240105T000000_IFCB134").contains("12"))
    assert(filled("D20240101T123000_IFCB134").contains("77-2024"))
    assert(filled("D20240106T000000_IFCB134").isEmpty)
  }

  test("duplicate response lines collapse to one dim row, preferring the non-null id") {
    val dir = Files.createTempDirectory("svepa-dup")
    dir.toFile.deleteOnExit()
    // a retried lookup saved twice: first attempt failed, retry succeeded
    Files.writeString(dir.resolve("responses.json"),
      """{"sample": "D20240101T123000_IFCB134", "id": null, "error": "timeout"}
        |{"sample": "D20240101T123000_IFCB134", "id": "77-2024", "error": null}
        |{"sample": "D20240106T000000_IFCB134", "id": null, "error": "no event"}
        |{"sample": "D20240106T000000_IFCB134", "id": null, "error": "no event"}
        |""".stripMargin)
    val svepa = SvepaSnapshot.parseResponses(spark, dir.toString)
    // exactly one row per looked-up sample (the reference loop emits one
    // row per missing pid) — duplicates must not fan out bin rows
    assert(svepa.count() == 2)
    val byId = svepa.as[(String, Option[String])].collect().toMap
    assert(byId("D20240101T123000_IFCB134").contains("77-2024"))
    assert(byId("D20240106T000000_IFCB134").isEmpty)
    // the left-join fill stays 1:1 under duplicated responses
    val bins = Seq(
      ("D20240101T123000_IFCB134", java.sql.Timestamp.valueOf("2024-01-01 12:30:00"), None: Option[Int]))
      .toDF("sample", "datetime", "cruise_no")
    assert(SvepaSnapshot.resolveCruiseNo(bins, svepa).count() == 1)
  }
}
