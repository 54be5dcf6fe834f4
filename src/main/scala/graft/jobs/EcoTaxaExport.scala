package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** EcoTaxa image-metadata export (SURVEY.md §3 / K2 — reference:
  * ifcb-image-export-pipeline.Rmd:474-830): the ~260-column wide EcoTaxa
  * contract populated from per-ROI metadata + slim features, written as
  * one TSV per annotation-category folder with the `[t]`/`[f]`
  * format-code first row.
  *
  * Columns the engine does not compute (ring/wedge/HOG spectra, texture,
  * Hausdorff symmetry — the non-slim feature tail) are emitted as nulls,
  * exactly like the reference's `ecotaxa_headers[1:n,] <- NA` pre-fill
  * (Rmd:474-479): the contract's SHAPE is fixed; population is whatever
  * the feature source provides.
  *
  * Scale shape: the projection is pure map-side; the only shuffle is the
  * one `repartition(category)` inside the partitioned sink.
  */
object EcoTaxaExport {

  /** Static/job-level values (the reference's Rmd params + Sys calls —
    * passed in, never computed, so runs are reproducible).
    */
  final case class Params(
      objectLink: String = "https://example.org/dataset-doi",
      annotationStatus: String = "validated",
      resolutionPixelsPerMicron: Double = 3.4,
      instrument: String = "IFCB",
      sampleSource: String = "",
      processSoft: String = "Spark, Scala",
      processSoftVersion: String = "",
      processLibrary: String = "graft",
      processLibraryVersion: String = "2",
      processScript: String = "EcoTaxaExport",
      processScriptVersion: String = "1",
      processDate: String = "",
      processTime: String = "",
      depth: Double = 0.0)

  /** EcoTaxa folder-name truncation (Rmd:369, 808): taxa lists collapse
    * to their first comma-separated segment, trimmed.
    */
  def truncateCategory(c: Column): Column = trim(element_at(split(c, ","), 1))

  private def range(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => f"$prefix$i%02d")

  /** The wide contract, reference order (Rmd:483-783, the populated
    * field sequence: identity/process block, object/annotation block,
    * depth, sample block, morphology, misc + shapehist + rotated,
    * texture, 7 moment invariants, ring01-50, hog01-81, wedge01-48).
    * The reference's ultimate order source is `ifcb_get_ecotaxa_example()`
    * (iRfcb package data, not vendored here); the Rmd's assignment
    * sequence is the best public in-repo evidence and is pinned
    * verbatim by EcoTaxaExportSpec's golden header test.
    */
  val contract: Seq[String] =
    Seq("img_file_name",
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
      "object_texture_third_moment", "object_texture_uniformity") ++
      (1 to 7).map(i => s"object_moment_invariant$i") ++
      range("object_ring", 50) ++
      range("object_hog", 81) ++
      range("object_wedge", 48)

  /** Source column for each contract column: metadata by canonical name,
    * features by the slim-feature names ([[graft.features.Features]]).
    * Anything absent from the input frame lands as null.
    */
  private def mapping(df: DataFrame, p: Params): Map[String, Column] = {
    val cols = df.columns.toSet
    def src(c: String): Option[Column] = if (cols(c)) Some(col(c)) else None
    val meta: Map[String, Option[Column]] = Map(
      "img_file_name" -> src("image"),
      "object_link" -> Some(lit(p.objectLink)),
      "object_annotation_status" -> Some(lit(p.annotationStatus)),
      "acq_resolution_pixels_per_micron" -> Some(lit(p.resolutionPixelsPerMicron)),
      "acq_instrument" -> Some(lit(p.instrument)),
      "sample_source" -> Some(lit(p.sampleSource)),
      "process_soft" -> Some(lit(p.processSoft)),
      "process_soft_version" -> Some(lit(p.processSoftVersion)),
      "process_library" -> Some(lit(p.processLibrary)),
      "process_library_version" -> Some(lit(p.processLibraryVersion)),
      "process_script" -> Some(lit(p.processScript)),
      "process_script_version" -> Some(lit(p.processScriptVersion)),
      "process_date" -> Some(lit(p.processDate)),
      "process_time" -> Some(lit(p.processTime)),
      "object_id" -> src("image").map(c => regexp_replace(c, "\\.[^.]*$", "")),
      "object_roi_number" -> src("roi"),
      "object_lat" -> src("lat"),
      "object_lon" -> src("lon"),
      "object_date" -> src("date"),
      "object_time" -> src("time").map(c => regexp_replace(c, ":", "")),
      "object_annotation_hierarchy" -> src("class_clean"),
      "object_annotation_category" -> src("subfolder"),
      "object_aphiaid" -> src("aphia_id"),
      "object_annotation_date" -> src("analysis_date"),
      "object_annotation_time" -> src("analysis_time").map(c => regexp_replace(c, ":", "")),
      "object_annotation_person_name" -> src("annotated_by"),
      "object_annotation_person_email" -> src("annotated_by_email"),
      "object_depth_min" -> Some(lit(p.depth)),
      "object_depth_max" -> Some(lit(p.depth)),
      "sample_vessel" -> src("ship"),
      "sample_id" -> src("sample_name"),
      "sample_station" -> src("station_name"),
      "sample_cruise" -> src("cruise_number"))
    val features: Map[String, Option[Column]] = Map(
      "object_area" -> src("Area"),
      "object_biovolume" -> src("Biovolume"),
      "object_perimeter" -> src("Perimeter"),
      "object_bounding_box_xwidth" -> src("BoundingBox_xwidth"),
      "object_bounding_box_ywidth" -> src("BoundingBox_ywidth"),
      "object_convex_area" -> src("ConvexArea"),
      "object_convex_perimeter" -> src("ConvexPerimeter"),
      "object_feret_diameter" -> src("maxFeretDiameter"),
      "object_major_axis_length" -> src("MajorAxisLength"),
      "object_minor_axis_length" -> src("MinorAxisLength"),
      "object_orientation" -> src("Orientation"),
      "object_eccentricity" -> src("Eccentricity"),
      "object_equiv_diameter" -> src("EquivDiameter"),
      "object_extent" -> src("Extent"),
      "object_solidity" -> src("Solidity"),
      "object_num_blobs" -> src("numBlobs"),
      "object_summed_area" -> src("summedArea"),
      "object_summed_biovolume" -> src("summedBiovolume"),
      "object_summed_convex_area" -> src("summedConvexArea"),
      "object_summed_convex_perimeter" -> src("summedConvexPerimeter"),
      "object_summed_major_axis_length" -> src("summedMajorAxisLength"),
      "object_summed_minor_axis_length" -> src("summedMinorAxisLength"),
      "object_summed_perimeter" -> src("summedPerimeter"),
      "object_area_over_perimeter_squared" -> src("Area_over_PerimeterSquared"),
      "object_area_over_perimeter" -> src("Area_over_Perimeter"),
      "object_summed_convex_perimeter_over_perimeter" -> src("summedConvexPerimeter_over_Perimeter"))
    // extended tail (graft.features.ExtendedFeatures output names)
    val extended: Map[String, Option[Column]] = Map(
      "object_h180" -> src("h180"),
      "object_h90" -> src("h90"),
      "object_hflip" -> src("hflip"),
      // zero-guarded ratios (round-12 review): a perfectly symmetric
      // ROI has hflip/h180 exactly 0 (modifiedHausdorff of identical
      // point sets), and ANSI division would abort the whole export for
      // one such row; NULL renders as the NA the contract pre-fills
      "object_h90_over_hflip" -> ((src("h90"), src("hflip")) match {
        case (Some(a), Some(b)) => Some(when(b =!= 0.0, a / b)); case _ => None
      }),
      "object_h90_over_h180" -> ((src("h90"), src("h180")) match {
        case (Some(a), Some(b)) => Some(when(b =!= 0.0, a / b)); case _ => None
      }),
      "object_hflip_over_h180" -> ((src("hflip"), src("h180")) match {
        case (Some(a), Some(b)) => Some(when(b =!= 0.0, a / b)); case _ => None
      }),
      "object_rotated_area" -> src("rotated_area"),
      "object_rotated_bounding_box_xwidth" -> src("rotated_bbox_xwidth"),
      "object_rotated_bounding_box_ywidth" -> src("rotated_bbox_ywidth"),
      "object_rotated_bounding_box_solidity" -> src("rotated_bbox_solidity"),
      "object_shapehist_mean_norm_eq_d" -> src("perimeter_mean"),
      "object_shapehist_median_norm_eq_d" -> src("perimeter_median"),
      "object_shapehist_skewness_norm_eq_d" -> src("perimeter_skewness"),
      "object_shapehist_kurtosis_norm_eq_d" -> src("perimeter_kurtosis"),
      "object_texture_average_contrast" -> src("texture_average_contrast"),
      "object_texture_average_gray_level" -> src("texture_average_gray_level"),
      "object_texture_entropy" -> src("texture_entropy"),
      "object_texture_smoothness" -> src("texture_smoothness"),
      "object_texture_third_moment" -> src("texture_third_moment"),
      "object_texture_uniformity" -> src("texture_uniformity")) ++
      (1 to 7).map(i =>
        s"object_moment_invariant$i" -> src(s"moment_invariant$i")).toMap ++
      (1 to 81).map(i =>
        f"object_hog$i%02d" -> src(f"hog$i%02d")).toMap ++
      Map(
        "object_r_wcenter2total_powerratio" -> src("rw_power_ratio"),
        "object_r_whalfpowerintegral" -> src("rw_power_integral")) ++
      (1 to 50).map(i => f"object_ring$i%02d" -> src(f"ring$i%02d")).toMap ++
      (1 to 48).map(i => f"object_wedge$i%02d" -> src(f"wedge$i%02d")).toMap
    (meta ++ features ++ extended).collect { case (k, Some(v)) => k -> v }
  }

  /** Projects an input frame onto the full contract (unmapped → null). */
  def project(df: DataFrame, params: Params = Params()): DataFrame = {
    val m = mapping(df, params)
    df.select(contract.map(c => m.getOrElse(c, lit(null).cast("string")).as(c)): _*)
  }

  /** EcoTaxa image packaging (`ifcb_zip_pngs`, Rmd:833-849): raw 8-bit
    * ROI rasters encoded as grayscale PNGs under `<class>/<name>.png`
    * entries, packed into size-capped zip parts with a MANIFEST via the
    * K4 sink. Encoding runs on executors; only part planning touches
    * metadata.
    *
    * @param images rows: class (folder), name (without extension),
    *               bytes (raw 8-bit), width, height
    */
  def writeImageZips(images: DataFrame, dir: String,
                     maxPartBytes: Long = 500L * 1024 * 1024): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    val pngs = images
      .select(col("class").cast("string"), col("name").cast("string"),
        col("bytes"), col("width").cast("int"), col("height").cast("int"))
      .as[(String, String, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (cls, name, bytes, w, h) =>
          (s"$cls/$name.png", graft.multimodal.Media.encodePng(
            graft.multimodal.Media.grayPixels(bytes, w, h), w, h))
        }
      }
      .toDF("entry", "png")
    graft.sources.ZipSink.write(pngs, "entry", "png", dir, maxPartBytes)
  }

  /** The contract's text-typed columns — the metadata/identity block.
    * Everything else (morphology, rings/hogs/wedges, moments, textures,
    * PMT channels, lat/lon, depth, resolution, roi number, aphia id) is
    * numeric `[f]`. STATIC by contract, not derived from runtime input
    * types: an input frame missing the feature tail projects those
    * columns as null strings, and deriving codes from the schema then
    * marked numeric contract columns `[t]` — flipping per run with
    * whatever inputs were present, so EcoTaxa imports typed them as
    * text (round-11 review).
    */
  val textColumns: Set[String] = Set(
    "img_file_name", "object_link", "object_annotation_status",
    "acq_instrument", "sample_source",
    "process_soft", "process_soft_version", "process_library",
    "process_library_version", "process_script", "process_script_version",
    "process_date", "process_time",
    "object_id", "object_date", "object_time",
    "object_annotation_hierarchy", "object_annotation_category",
    "object_annotation_date", "object_annotation_time",
    "object_annotation_person_name", "object_annotation_person_email",
    "sample_vessel", "sample_id", "sample_station", "sample_cruise")

  /** Full export: contract projection → truncated category → one TSV
    * folder per class with the format-code first row (K2 layout, all
    * classes in one pass — Rmd:793-830's per-class loop re-expressed).
    */
  def write(df: DataFrame, outDir: String, params: Params = Params()): Unit = {
    val projected = project(df, params)
      .withColumn("object_annotation_category",
        truncateCategory(col("object_annotation_category")))
    val codes = contract
      .map(c => c -> (if (textColumns(c)) "[t]" else "[f]")).toMap
    Sinks.partitionedTsv(projected, "object_annotation_category", outDir,
      formatCodes = Some(codes))
  }
}
