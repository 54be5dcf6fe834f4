package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WHOI-style external-dataset curation (reference:
  * code/annotations/annotate_whoi_data.R and
  * get_whoi_plankton_sams.R:40-59): ingest a per-class folder tree of
  * legacy-named plankton PNGs, synthesize sample ids and dates from the
  * day-of-year filename format, derive the class list from the folder
  * names, and bulk-annotate every ROI — pngs get their folder's class,
  * every other ROI of a touched sample gets `unclassified` (id 1), the
  * reference's `ifcb_annotate_batch(..., unclassified_id = 1)` flow.
  *
  * Everything here is map-side expression work plus one tiny distinct
  * for the class dim and one left join keyed on the sample — the same
  * composition discipline as [[SharkExport]]: thin glue over operators
  * that already exist (regex id extraction, date arithmetic, per-class
  * bulk labels).
  */
object WhoiCuration {

  /** Legacy WHOI png name: `IFCBn_YYYY_DDD_HHMMSS_roi.png` — day-of-year
    * dates (get_whoi_plankton_sams.R:40-44 regex).
    */
  private val LegacyPattern = "^(IFCB\\d+)_(\\d{4})_(\\d{3})_(\\d{6})_(\\d+)\\.png$"

  /** Parse a frame of png `path`s (per-class folders: `.../<class>/<name>`)
    * into (class_folder, sample, ifcb_number, date, timestamp, roi,
    * canonical_name):
    *  - `sample` is the legacy id without the roi
    *    (`IFCB1_2014_188_222013`);
    *  - `date` converts day-of-year: Jan 1 of the year + (DDD − 1)
    *    (get_whoi_plankton_sams.R:42-44);
    *  - `canonical_name` is the modern rename target
    *    `IyyyyMMdd'T'HHmmss_IFCB%03d_%05d.png` (annotate_whoi_data.R:
    *    23-37 `new_name`).
    * Rows whose basename does not match the legacy format are dropped —
    * the reference's "Unknown format" branch.
    */
  def parseLegacyPngs(files: DataFrame): DataFrame = {
    val segs = split(col("path"), "/")
    val base = element_at(segs, -1)
    // a bare basename (a listing relative to the class directory) has
    // no -2 segment; ANSI element_at would abort the whole run on one
    // such row instead of the documented Unknown-format DROP
    // (round-14 review) — null folder keeps the row droppable
    val folder = when(size(segs) >= 2, element_at(segs, -2))
    def part(i: Int) = regexp_extract(base, LegacyPattern, i)
    files
      .withColumn("class_folder", folder)
      .withColumn("__ifcb", part(1))
      .withColumn("__year", part(2))
      .withColumn("__doy", part(3))
      .withColumn("__time", part(4))
      .withColumn("__roi", part(5))
      // no containing directory = no class label: drop like any other
      // non-conforming row
      .filter(col("__ifcb") =!= "" && col("class_folder").isNotNull)
      .withColumn("sample",
        concat_ws("_", col("__ifcb"), col("__year"), col("__doy"), col("__time")))
      .withColumn("date",
        date_add(to_date(concat(col("__year"), lit("-01-01"))),
          col("__doy").cast("int") - 1))
      // try_to_timestamp + the isNotNull filter below (round-12
      // review): a legacy name whose \d{6} time field encodes an
      // invalid clock reading (hour 25) matches the pattern but is not
      // a timestamp — strict to_timestamp would abort the whole
      // curation run under ANSI; such names drop like the reference's
      // "Unknown format" branch instead
      .withColumn("timestamp", try_to_timestamp(concat(
        col("date"), lit(" "),
        substring(col("__time"), 1, 2), lit(":"),
        substring(col("__time"), 3, 2), lit(":"),
        substring(col("__time"), 5, 2))))
      .filter(col("timestamp").isNotNull)
      .withColumn("roi", col("__roi").cast("int"))
      .withColumn("canonical_name", concat(
        lit("I"), date_format(col("timestamp"), "yyyyMMdd'T'HHmmss"),
        lit("_IFCB"),
        // %0Nd pads WITHOUT truncating (the reference's sprintf) —
        // lpad would silently cut IFCB1234 down to instrument 123
        format_string("%03d",
          regexp_replace(col("__ifcb"), "^IFCB", "").cast("int")),
        lit("_"), format_string("%05d", col("roi")), lit(".png")))
      .select(col("path"), col("class_folder"), col("sample"),
        col("__ifcb").as("ifcb_number"), col("date"), col("timestamp"),
        col("roi"), col("canonical_name"))
  }

  /** Class list from the folder names: `unclassified` is always id 1,
    * the observed classes follow alphabetically (annotate_whoi_data.R:
    * 46-50 `c("unclassified", basename(list.dirs(...)))`). The dim is
    * O(classes) rows — the single-partition window is bounded.
    */
  def class2useFromFolders(parsed: DataFrame): DataFrame = {
    val spark = parsed.sparkSession
    import spark.implicits._
    val observed = parsed.select(col("class_folder").as("class_name"))
      .filter(col("class_name") =!= "unclassified")
      .distinct()
      .withColumn("class_idx",
        (row_number().over(Window.orderBy(col("class_name"))) + 1).cast("int"))
    Seq((1, "unclassified")).toDF("class_idx", "class_name")
      .unionByName(observed.select(col("class_idx"), col("class_name")))
  }

  /** Bulk per-class annotation: each png ROI gets its folder's class id;
    * every OTHER ROI of any touched sample (present in the ADC
    * inventory, no png) gets `unclassified` = 1 — matching
    * `ifcb_annotate_batch(..., unclassified_id = 1)` applied per class
    * folder. Output is the [[graft.sources.MatSource.manualClassList]]
    * relational shape, so the result feeds [[graft.operators.ManualMerge]]
    * directly.
    *
    * @param adcRois full ROI inventory (sample, roi_number) from the ADC
    *                files ([[graft.sources.RoiSource]] grain)
    *
    * The inventory side drives the join: a png annotation whose
    * (sample, roi_number) is missing from the ADC inventory cannot be
    * represented in a classlist (the reference sizes each sample's
    * classlist by its ADC ROI count) and does NOT appear in the output.
    * That drop must be visible, not silent — run [[annotationOrphans]]
    * over the same inputs and alert/ledger its rows; an incomplete ADC
    * inventory otherwise reads as "fewer labels", the failure mode
    * ManualMerge's surface-don't-drop discipline exists to prevent.
    */
  def annotateBatch(parsed: DataFrame, class2use: DataFrame,
      adcRois: DataFrame): DataFrame = {
    // one label per (sample, roi): the same png left under TWO class
    // folders used to fan the ADC row out to two contradictory rows
    // (round-12 review). The reference's sequential ifcb_annotate_batch
    // iterates folders in listing order and the LAST write wins —
    // mirrored deterministically as the lexicographically greatest
    // class_name (list.files returns alphabetical order).
    val conflictW = Window.partitionBy(col("sample"), col("roi"))
      .orderBy(col("class_name").desc)
    val labeled = parsed
      .join(broadcast(class2use),
        parsed("class_folder") === class2use("class_name"))
      .withColumn("__rk", row_number().over(conflictW))
      .filter(col("__rk") === 1)
      .select(col("sample"), col("roi").as("roi_number"),
        col("class_idx"), col("class_name"))
    val touched = labeled.select(col("sample")).distinct()
    adcRois
      .join(touched, Seq("sample")) // only samples with ≥1 annotated png
      .join(labeled, Seq("sample", "roi_number"), "left")
      .select(col("sample"), col("roi_number"),
        coalesce(col("class_idx"), lit(1)).as("manual_idx"),
        coalesce(col("class_name"), lit("unclassified")).as("class_name"))
  }

  /** The labeled pngs [[annotateBatch]] cannot place: annotations whose
    * (sample, roi_number) is absent from the ADC inventory — evidence of
    * an incomplete or stale inventory. Empty on healthy inputs; callers
    * surface any rows (ledger/alert) instead of letting them vanish.
    */
  def annotationOrphans(parsed: DataFrame, class2use: DataFrame,
      adcRois: DataFrame): DataFrame =
    parsed
      .join(broadcast(class2use),
        parsed("class_folder") === class2use("class_name"))
      .select(col("sample"), col("roi").as("roi_number"),
        col("class_name"), col("path"))
      .join(adcRois.select(col("sample"), col("roi_number")),
        Seq("sample", "roi_number"), "left_anti")
}
