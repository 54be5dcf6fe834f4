package graft.jobs

import java.nio.file.Files
import graft.SparkSpec

/** EcoTaxa export: contract shape, metadata/feature mapping, per-class
  * TSV layout with the format-code first row.
  */
class EcoTaxaExportSpec extends SparkSpec {
  import spark.implicits._

  private def input = Seq(
    ("D20230801T120000_IFCB134_00003.png", 3L, 57.5, 11.8, "20230801", "12:00:00",
      "Dinophysis acuta, flagellate", "Dinophysis acuta, flagellate", 109604L,
      "Mesodinium_rubrum", 231.0, 1523.5, 61.2),
    ("D20230801T120000_IFCB134_00007.png", 7L, 57.5, 11.8, "20230801", "12:00:00",
      "Mesodinium rubrum", "Mesodinium rubrum", 232069L,
      "Mesodinium_rubrum", 180.0, 1100.0, 55.0)
  ).toDF("image", "roi", "lat", "lon", "date", "time",
    "subfolder", "class_clean", "aphia_id",
    "sample_name", "Area", "Biovolume", "Perimeter")

  test("project emits the full contract in reference order, nulls for unmapped") {
    val out = EcoTaxaExport.project(input)
    assert(out.columns.toSeq == EcoTaxaExport.contract)
    assert(out.columns.length > 250, s"got ${out.columns.length}")
    val r = out.collect().head
    assert(r.getAs[String]("img_file_name") == "D20230801T120000_IFCB134_00003.png")
    assert(r.getAs[String]("object_id") == "D20230801T120000_IFCB134_00003")
    assert(r.getAs[String]("object_time") == "120000")
    assert(r.getAs[Double]("object_area") == 231.0)
    assert(r.getAs[String]("object_annotation_status") == "validated")
    assert(r.getAs[String]("object_hog81") == null) // non-slim tail = null
  }

  test("write lays out one folder per truncated category with code row first") {
    val dir = Files.createTempDirectory("ecotaxa").toString
    EcoTaxaExport.write(input, dir)
    val sub = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    // categories truncated at the first comma
    assert(sub.toSeq == Seq(
      "object_annotation_category=Dinophysis acuta",
      "object_annotation_category=Mesodinium rubrum"))
    val read = spark.read.option("sep", "\t").option("header", "true").csv(dir)
    // 2 data rows + 2 code rows
    assert(read.count() == 4)
    val codeRows = read.filter($"object_link" === "[t]")
    assert(codeRows.count() == 2)
    assert(codeRows.select("object_area").as[String].collect().forall(_ == "[f]"))
  }

  test("writeImageZips packages per-class PNGs with manifest, round-trip exact") {
    val dir = Files.createTempDirectory("ecozip").toString
    val (raw, h, w) = graft.queries.FeatureExtract.renderRoi(77L)
    val images = Seq(
      ("Mesodinium_rubrum", "D2023_00077", raw, w, h),
      ("other", "D2023_00078", raw, w, h)
    ).toDF("class", "name", "bytes", "width", "height")
    val manifest = EcoTaxaExport.writeImageZips(images, dir, maxPartBytes = 10L * 1024 * 1024)
    assert(manifest.count() == 2)
    // read the zip back and decode one PNG
    val zips = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".zip"))
    assert(zips.nonEmpty)
    val zf = new java.util.zip.ZipFile(zips.head)
    import scala.jdk.CollectionConverters._
    val names = zf.entries().asScala.map(_.getName).toSet
    assert(names.contains("Mesodinium_rubrum/D2023_00077.png"))
    assert(names.contains("MANIFEST.txt"))
    val entry = zf.getEntry("Mesodinium_rubrum/D2023_00077.png")
    val png = zf.getInputStream(entry).readAllBytes()
    val (px, dw, dh) = graft.multimodal.Media.decodeImage(png, 0, 0)
    zf.close()
    assert(dw == w && dh == h)
    assert(px.sameElements(raw.map(_ & 0xff)))
  }

  test("extended feature columns populate when the input carries them") {
    val withExt = input
      .withColumn("h180", org.apache.spark.sql.functions.lit(1.5))
      .withColumn("h90", org.apache.spark.sql.functions.lit(3.0))
      .withColumn("texture_entropy", org.apache.spark.sql.functions.lit(4.2))
      .withColumn("hog01", org.apache.spark.sql.functions.lit(0.07))
    val out = EcoTaxaExport.project(withExt)
    val r = out.collect().head
    assert(r.getAs[Double]("object_h180") == 1.5)
    assert(r.getAs[Double]("object_h90_over_h180") == 2.0)
    assert(r.getAs[Double]("object_texture_entropy") == 4.2)
    assert(r.getAs[Double]("object_hog01") == 0.07)
    assert(r.getAs[String]("object_hog02") == null)
  }
}
