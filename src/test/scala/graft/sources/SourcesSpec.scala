package graft.sources

import java.nio.file.{Files, Path}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S2 HDR parser, S11 file index, K1/K2 sinks — driven end-to-end through
  * real files in a temp dir.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d
  }

  test("HdrSource parses key:value headers into one typed row per sample") {
    val dir = tmpDir("hdr")
    Files.writeString(dir.resolve("D20240101T123000_IFCB134.hdr"),
      """gpsLatitude: 57.5969
        |gpsLongitude: 11.8465
        |runTime: 1187.5
        |sampleType: normal
        |""".stripMargin)
    Files.writeString(dir.resolve("D20240102T000000_IFCB134.hdr"),
      """gpsLatitude: 58.0
        |gpsLongitude: 12.0
        |runTime: 1200.0
        |sampleType: beads
        |""".stripMargin)
    val df = HdrSource.read(spark, dir.toString + "/*.hdr",
      stringKeys = Seq("sampleType"),
      numericKeys = Seq("gpsLatitude", "gpsLongitude", "runTime"))
    val rows = df.orderBy("sample").collect()
    assert(rows.length == 2)
    val r = rows.head
    assert(r.getAs[String]("sample") == "D20240101T123000_IFCB134")
    assert(r.getAs[java.sql.Timestamp]("timestamp").toString == "2024-01-01 12:30:00.0")
    assert(r.getAs[String]("sampleType") == "normal")
    assert(math.abs(r.getAs[Double]("gpsLatitude") - 57.5969) < 1e-9)
  }

  test("FileIndex lists files, gates size, detects new samples") {
    val dir = tmpDir("fidx")
    Files.write(dir.resolve("D20240101T123000_IFCB134.roi"), Array.fill[Byte](100)(1))
    Files.write(dir.resolve("D20240102T000000_IFCB134.roi"), Array.fill[Byte](3000)(1))
    Files.write(dir.resolve("D20240103T000000_IFCB134.roi"), Array.emptyByteArray)
    val idx = FileIndex.list(spark, dir.toString)
    // 0-byte files must be LISTED so the empty-bin gate can dead-letter
    // them (ifcb_ingest_and_qc.R:190-197) — the binaryFile source
    // silently omits them, which is why list() uses an FS listing
    assert(idx.count() == 3)
    val (clean, dead) = FileIndex.sizeGate(idx, maxBytes = 1000L)
    assert(clean.count() == 1)
    assert(dead.select("reason").as[String].collect().toSet ==
      Set("oversize", "empty"))
    val processed = Seq("D20240101T123000_IFCB134").toDF("sample")
    val fresh = FileIndex.newFiles(idx, processed)
    assert(fresh.select("sample").as[String].collect().toSet ==
      Set("D20240102T000000_IFCB134", "D20240103T000000_IFCB134"))
  }

  test("newFilesBloom is exactly newFiles (bloom false positives stripped)") {
    // large-ish processed log + a sloppy fpp so false positives are
    // plausible; the exact anti-join on the maybe side must strip them
    val processed = (1 to 5000).map(i => f"D2024$i%04d_IFCB134").toDF("sample")
    val index = ((4900 to 5100).map(i => f"D2024$i%04d_IFCB134") :+ "UNSEEN")
      .toDF("sample")
      .withColumn("length", lit(1L))
    val expect = FileIndex.newFiles(index, processed)
      .select("sample").as[String].collect().toSet
    val got = FileIndex.newFilesBloom(index, processed,
        expectedItems = 5000, fpp = 0.2)
      .select("sample").as[String].collect().toSet
    assert(got == expect)
    assert(got.contains("UNSEEN") && got.size == 101)
  }

  test("newFilesBloom keeps the no-false-negatives invariant for numeric keys") {
    // the sketch must be built over the same representation it is probed
    // with: a LongType key inserted natively but probed as a string makes
    // membership random — processed ids would mass re-ingest
    val processed = (1L to 3000L).toDF("file_id")
    val index = (2900L to 3050L).toDF("file_id").withColumn("length", lit(1L))
    val got = FileIndex.newFilesBloom(index, processed, key = "file_id",
        expectedItems = 3000, fpp = 0.1)
      .select("file_id").as[Long].collect().toSet
    assert(got == (3001L to 3050L).toSet, s"got ${got.size} ids")
  }

  test("partitionedTsv writes one folder per class with format-code first row") {
    val dir = tmpDir("k2").resolve("out").toString
    val df = Seq(
      ("img1", "diatom", 10.5), ("img2", "diatom", 11.0), ("img3", "ciliate", 3.0)
    ).toDF("img", "class_name", "area")
    Sinks.partitionedTsv(df, "class_name", dir,
      formatCodes = Some(Map("img" -> "[t]", "area" -> "[f]")))
    val diatom = spark.read.option("sep", "\t").option("header", "true")
      .csv(dir + "/class_name=diatom")
    assert(diatom.count() == 3) // code row + 2 data rows
    val first = diatom.head()
    assert(first.getAs[String]("img") == "[t]" && first.getAs[String]("area") == "[f]")
    val ciliate = spark.read.option("sep", "\t").option("header", "true")
      .csv(dir + "/class_name=ciliate")
    assert(ciliate.count() == 2)
  }

  test("deliveryTsv writes nulls as empty strings") {
    val dir = tmpDir("k1").resolve("out").toString
    Seq(("a", Some(1.0)), ("b", None)).toDF("k", "v")
      .write.mode("overwrite").option("sep", "\t").option("header", "true")
      .option("nullValue", "").csv(dir) // same options as Sinks.deliveryTsv
    Sinks.deliveryTsv(Seq(("a", Option(1.0)), ("b", Option.empty[Double])).toDF("k", "v"), dir)
    val lines = spark.read.text(dir).as[String].collect()
    assert(lines.exists(_ == "b\t"))
  }
}
