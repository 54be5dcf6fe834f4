package graft.jobs

import java.nio.file.Files
import org.apache.spark.sql.functions.{col, lit}
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

  test("header order is pinned verbatim to the Rmd:483-783 assignment sequence") {
    // golden, spelled out independently of the contract builder: the
    // scalar block in the reference's exact order, then ring01-50,
    // hog01-81, wedge01-48 (the Rmd's section sequence)
    val scalarBlock = Seq(
      "img_file_name",
      "object_link", "object_annotation_status",
      "acq_resolution_pixels_per_micron", "acq_instrument", "sample_source",
      "process_soft", "process_soft_version", "process_library",
      "process_library_version", "process_script", "process_script_version",
      "process_date", "process_time",
      "object_id", "object_roi_number", "object_lat", "object_lon",
      "object_date", "object_time", "object_annotation_hierarchy",
      "object_annotation_category", "object_aphiaid",
      "object_annotation_date", "object_annotation_time",
      "object_annotation_person_name", "object_annotation_person_email",
      "object_depth_min", "object_depth_max",
      "sample_vessel", "sample_id", "sample_station", "sample_cruise",
      "object_pmt_scattering", "object_pmt_fluorescence",
      "object_area", "object_biovolume", "object_perimeter",
      "object_bounding_box_xwidth", "object_bounding_box_ywidth",
      "object_convex_area", "object_convex_perimeter",
      "object_feret_diameter", "object_major_axis_length",
      "object_minor_axis_length", "object_orientation",
      "object_eccentricity", "object_equiv_diameter", "object_extent",
      "object_r_wcenter2total_powerratio", "object_r_whalfpowerintegral",
      "object_solidity", "object_num_blobs",
      "object_h180", "object_h90", "object_hflip",
      "object_summed_area", "object_summed_biovolume",
      "object_summed_convex_area", "object_summed_convex_perimeter",
      "object_summed_feret_diameter", "object_summed_major_axis_length",
      "object_summed_minor_axis_length", "object_summed_perimeter",
      "object_shapehist_kurtosis_norm_eq_d", "object_shapehist_mean_norm_eq_d",
      "object_shapehist_median_norm_eq_d", "object_shapehist_mode_norm_eq_d",
      "object_shapehist_skewness_norm_eq_d",
      "object_area_over_perimeter_squared", "object_area_over_perimeter",
      "object_h90_over_hflip", "object_h90_over_h180",
      "object_hflip_over_h180",
      "object_summed_convex_perimeter_over_perimeter",
      "object_rotated_bounding_box_solidity", "object_rotated_area",
      "object_rotated_bounding_box_xwidth", "object_rotated_bounding_box_ywidth",
      "object_texture_average_contrast", "object_texture_average_gray_level",
      "object_texture_entropy", "object_texture_smoothness",
      "object_texture_third_moment", "object_texture_uniformity",
      "object_moment_invariant1", "object_moment_invariant2",
      "object_moment_invariant3", "object_moment_invariant4",
      "object_moment_invariant5", "object_moment_invariant6",
      "object_moment_invariant7")
    val golden = scalarBlock ++
      (1 to 50).map(i => f"object_ring$i%02d") ++
      (1 to 81).map(i => f"object_hog$i%02d") ++
      (1 to 48).map(i => f"object_wedge$i%02d")
    assert(EcoTaxaExport.contract == golden)
    assert(golden.length == 92 + 50 + 81 + 48)

    // and the physical TSV header line carries exactly that order
    val dir = Files.createTempDirectory("ecohdr").toString
    EcoTaxaExport.write(input, dir)
    val part = Files.walk(java.nio.file.Paths.get(dir)).iterator()
    import scala.jdk.CollectionConverters._
    val tsv = part.asScala.find(p => p.getFileName.toString.endsWith(".csv")).get
    val header = Files.readAllLines(tsv).get(0)
    // write() drops the category column into the directory layout
    val expected = golden.filterNot(_ == "object_annotation_category")
    assert(header == expected.mkString("\t"))
  }

  test("end-to-end EcoTaxa row matches the reference golden column-by-column (round-11)") {
    // tools/golden_features.py runs the REFERENCE kernel over the fixture
    // and pushes slim + extended values through an independent Python
    // transcription of the Rmd:483-783 assignment map; here the Scala
    // kernel + EcoTaxaExport.write produce the actual TSV and every
    // contract column is compared against that golden row.
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val in = getClass.getResourceAsStream("/features_golden.json")
    require(in != null, "features_golden.json missing — run tools/golden_features.py")
    val golden = JsonMethods.parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    val er = golden \ "ecotaxa_row"
    val fixture = (er \ "fixture").asInstanceOf[JString].s
    val expected: Map[String, JValue] =
      (er \ "expected").asInstanceOf[JObject].obj.toMap
    assert(expected.keySet == EcoTaxaExport.contract.toSet,
      "golden row does not cover the contract exactly")

    // reference fixture mask/roi -> our kernel (slim + extended tail)
    val base = golden \ "features" \ fixture
    val mask = graft.features.Mask.from(
      (base \ "mask").asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s))
    val roiRows = (base \ "roi").asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JArray].arr.map {
        case JInt(n) => n.toInt; case JDouble(d) => d.toInt
        case other   => fail(s"unexpected $other")
      })
    val gray = graft.features.Segmentation.Gray(
      roiRows.size, roiRows.head.size, roiRows.flatten.toArray)
    val slim = graft.features.Features.compute(42L, mask)
    val ext = graft.features.ExtendedFeatures.compute(mask, gray)

    // metadata mirrored verbatim from tools/golden_features.py ECOTAXA_META
    val metaDf = Seq((
      "D20230801T120000_IFCB134_00042.png", 42L, 57.5, 11.8,
      "20230801", "12:00:00", "Mesodinium rubrum", "Mesodinium rubrum",
      232069L, "20230910", "09:30:00", "Alice Allen", "alice@example.org",
      "R/V Svea", "D20230801T120000_IFCB134", "BY31", "77"))
      .toDF("image", "roi", "lat", "lon", "date", "time", "class_clean",
        "subfolder", "aphia_id", "analysis_date", "analysis_time",
        "annotated_by", "annotated_by_email", "ship", "sample_name",
        "station_name", "cruise_number")
    val featCols =
      slim.productElementNames.zip(slim.productIterator).collect {
        case (n, v: Double) => lit(v).as(n)
      }.toSeq ++
        graft.features.ExtendedFeatures.keys.map(k => lit(ext(k)).as(k))
    val inputRow = metaDf.select(col("*") +: featCols: _*)

    val dir = Files.createTempDirectory("ecogolden").toString
    EcoTaxaExport.write(inputRow, dir)
    val read = spark.read.option("sep", "\t").option("header", "true").csv(dir)
    val data = read.filter($"object_link" =!= "[t]").collect()
    assert(data.length == 1, s"expected 1 data row, got ${data.length}")
    val row = data.head
    val got: String => String = c => row.getAs[String](c)

    val float32Cols = Set("object_biovolume", "object_summed_biovolume")
    var checked = 0
    for (c <- EcoTaxaExport.contract) {
      val g = got(c)
      expected(c) match {
        case JNull =>
          assert(g == null || g == "NaN", s"$c: expected empty/NaN, got '$g'")
        case JString(s) =>
          // the sink writes null for empty strings (nullValue "")
          if (s.isEmpty) assert(g == null, s"$c: expected empty, got '$g'")
          else assert(g == s, s"$c: expected '$s', got '$g'")
        case jv =>
          val want = jv match {
            case JDouble(d) => d
            case JInt(n)    => n.toDouble
            case other      => fail(s"$c: unexpected golden $other")
          }
          assert(g != null, s"$c: expected $want, got null")
          val have = g.toDouble
          val tol = if (float32Cols(c)) 1e-5 else 1e-9
          val rel = math.abs(have - want) / math.max(math.abs(want), 1e-12)
          assert(rel <= tol, s"$c: got $have, want $want (rel $rel)")
      }
      checked += 1
    }
    assert(checked == EcoTaxaExport.contract.length)
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
