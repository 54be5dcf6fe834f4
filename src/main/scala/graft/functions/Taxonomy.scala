package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Taxonomy post-lookup logic (reference: ifcb-data-pipeline.Rmd
  * class-names assembly): species-flag derivation from the raw class
  * name, the CF parent-name substitution against WoRMS parent records,
  * and the per-class F1 score used for classifier threshold selection.
  *
  * All pure column expressions / broadcast dim joins: the class dim is
  * tiny (hundreds of rows), the fact side never shuffles for any of
  * these.
  */
object Taxonomy {

  /** Species flag from the raw class name (Rmd:992-1008): `CF` for
    * `-like`/`_cf_`/`_like` names, then word-boundary `spp`/`group`/`sp`
    * (underscores read as spaces) append `SPP`/`GRP`/`SP` — the R
    * `paste` chain, trimmed.
    */
  def sflag(name: Column): Column = {
    val spaced = regexp_replace(name, "_", " ")
    val cf = when(
      name.contains("-like") || name.contains("_cf_") || name.contains("_like"),
      lit("CF"))
    def appendIf(cur: Column, cond: Column, tag: String): Column =
      when(cond, trim(concat_ws(" ", coalesce(cur, lit("")), lit(tag))))
        .otherwise(cur)
    val s1 = appendIf(cf, spaced.rlike("\\bspp\\b"), "SPP")
    val s2 = appendIf(s1, spaced.rlike("\\bgroup\\b"), "GRP")
    appendIf(s2, spaced.rlike("\\bsp\\b"), "SP")
  }

  /** Per-class F1 (Rmd:1001-1008): NaN inputs null out first (R's
    * `mutate_all(~ifelse(is.nan(.), NA, .))`), then 2PR/(P+R), null when
    * the denominator is zero (ANSI-safe).
    */
  def f1(precision: Column, recall: Column): Column = {
    val p = when(!isnan(precision), precision)
    val r = when(!isnan(recall), recall)
    // Nums.harmonic builds the IDENTICAL Column tree (2ab/(a+b) with the
    // zero-denominator null guard) — one copy of the policy (round-12)
    Nums.harmonic(p, r)
  }

  /** The 40-rule training-folder class-name cleaner
    * (reference: code/count_pngs_images.R:26-88): the ordered `gsub`
    * chain applied to CNN training-folder names before the WoRMS match —
    * version-suffix truncation (`iRfcb:::truncate_folder_name`; exactly
    * three trailing digits: a looser `_\d+$` would consume the "30" that
    * the `larger/smaller than 30` rules downstream exist to match),
    * Gymnodiniales/Ciliophora/Proboscia special cases, underscore
    * spacing, the morphology-suffix removals in source order, the
    * word-bounded species flags (R's `\<cf\>` ≡ `\bcf\b`), forma
    * dotting, the capital-letter slash join (applied twice, as in the
    * source), then first comma-part and trim.
    *
    * One ordered rule table renders BOTH the Spark Column chain and the
    * DuckDB SQL mirror, so the oracle evaluates the identical sequence
    * (`$1` backreferences translate to RE2's `\1`; every pattern is
    * RE2-safe).
    */
  val CleanRules: Seq[(String, String)] = Seq(
    "_\\d{3}$" -> "", // truncate_folder_name: "_001"-style version folders
    "Gymnodiniales_S" -> "Gymnodiniales",
    "Gymnodiniales_CS" -> "Gymnodiniales",
    "Gymnodiniales_CC" -> "Gymnodiniales",
    "Ciliophora_S" -> "Ciliophora",
    "cf_Proboscia_rhizosolenia" -> "Proboscia_Rhizosolenia",
    "_" -> " ",
    " single cell" -> "",
    " single" -> "",
    " chain" -> "",
    " coil" -> "",
    "-coiled" -> "",
    " filament" -> "",
    " pair" -> "",
    "-like" -> "",
    " like" -> "",
    " bundle" -> "",
    // NOTE: " larger than 30" firing first makes the
    // " larger than 30unidentified" rule unreachable (it strips the
    // prefix, leaving "…unidentified"); same for the smaller-than pair
    // below. The REFERENCE applies its gsubs in exactly this order
    // (count_pngs_images.R:45-46) so the shadowing is transcribed
    // deliberately — bug-compatible output is the contract here.
    " larger than 30" -> "",
    " larger than 30unidentified" -> "",
    " than 30" -> "",
    " smaller than 30unidentified" -> "",
    " smaller than 30" -> "",
    " smaller" -> "",
    " elliptical" -> "",
    " thin" -> "",
    " small" -> "",
    " sideview" -> "",
    " bottomview" -> "",
    " heterotrof" -> "",
    " heterotropic" -> "",
    " large" -> "",
    " thick" -> "",
    " sp01" -> "",
    " sp02" -> "",
    " sp1" -> "",
    " sp2" -> "",
    "\\bcf\\b" -> "",
    "\\bspp\\b" -> "",
    "\\bsp\\b" -> "",
    " group" -> "",
    "  " -> " ",
    "\\bf\\b" -> "f.",
    " ([A-Z])" -> "/$1",
    " ([A-Z])" -> "/$1")

  // --- per-script battery variants (round-14 parity audit) ------------------
  // The reference carries FOUR orderly-divergent copies of the cleaner.
  // [[CleanRules]] above is count_pngs_images.R's (the longest, with the
  // Gymnodiniales/Ciliophora special cases); the three below are the
  // variant scripts' own batteries, shared-segment composed so each
  // table IS its script's gsub sequence, in source order.
  private val TruncateRule = "_\\d{3}$" -> ""
  private val UnderscoreRule = "_" -> " "
  private val LikeBundleRules: Seq[(String, String)] =
    Seq("-like" -> "", " like" -> "", " bundle" -> "")
  private val ThirtyRules: Seq[(String, String)] = Seq(
    // same deliberate shadowing as CleanRules: " larger than 30" first
    " larger than 30" -> "",
    " larger than 30unidentified" -> "",
    " smaller than 30unidentified" -> "",
    " smaller than 30" -> "")
  private val FlagTailRules: Seq[(String, String)] = Seq(
    "\\bcf\\b" -> "", "\\bspp\\b" -> "", "\\bsp\\b" -> "",
    " group" -> "", "  " -> " ", "\\bf\\b" -> "f.",
    " ([A-Z])" -> "/$1", " ([A-Z])" -> "/$1")

  /** The main image-export battery
    * (ifcb-image-export-pipeline.Rmd:334-359): truncation + the short
    * morphology list WITH " round", none of count_pngs' special cases.
    */
  val CleanRulesExport: Seq[(String, String)] =
    Seq(TruncateRule, UnderscoreRule) ++
      Seq(" single cell", " single", " chain", " coil", " filament",
        " pair", " round").map(_ -> "") ++
      LikeBundleRules ++ ThirtyRules ++ FlagTailRules

  /** The NIVA export battery
    * (ifcb-image-export-pipeline-niva.Rmd:131-158): the export battery
    * plus " heterotropic" (after coil) and " colony" (after filament) —
    * NIVA's training folders carry those morphology suffixes.
    */
  val CleanRulesNiva: Seq[(String, String)] =
    Seq(TruncateRule, UnderscoreRule) ++
      Seq(" single cell", " single", " chain", " coil", " heterotropic",
        " filament", " colony", " pair", " round").map(_ -> "") ++
      LikeBundleRules ++ ThirtyRules ++ FlagTailRules

  /** The MATLAB SHARK-delivery battery
    * (code/ifcb_delivery_data_to_shark_matlab.R:395-434): NO folder
    * truncation (names come from class2use lists, not version-suffixed
    * training folders), no " round" — otherwise the export sequence.
    */
  val CleanRulesSharkMatlab: Seq[(String, String)] =
    Seq(UnderscoreRule) ++
      Seq(" single cell", " single", " chain", " coil", " filament",
        " pair").map(_ -> "") ++
      LikeBundleRules ++ ThirtyRules ++ FlagTailRules

  /** Applies a battery (default [[CleanRules]]), then the combined-class
    * first-name cut and trim (count_pngs_images.R:83-88) — one codegen'd
    * projection. Pass a variant table to run a variant script's cleaner.
    */
  def cleanClassName(c: Column, rules: Seq[(String, String)] = CleanRules): Column =
    trim(element_at(split(Strings.regexClean(rules)(c), ","), 1))

  /** DuckDB mirror of [[cleanClassName]] — same table, same order. */
  def cleanClassNameSql(expr: String, rules: Seq[(String, String)] = CleanRules): String = {
    val replaced = rules.foldLeft(expr) { case (acc, (p, r)) =>
      s"regexp_replace($acc, '$p', '${r.replace("$1", "\\1")}', 'g')"
    }
    s"trim(string_split($replaced, ',')[1])"
  }

  /** CF parent substitution (Rmd:1027-1049): for taxa flagged exactly
    * `CF`, the scientific name and AphiaID are replaced by the parent
    * record's; every row falls back `parentName → scientificname →
    * class_clean` (R's coalesce chain), and a consumed `CF` flag nulls
    * out. Parent records are restricted to the parent ids of CF rows
    * (the reference only fetches those) and broadcast.
    *
    * BUG-COMPATIBILITY NOTE (round-14 adjudication): the substitution
    * joins by `parentNameUsageID` ALONE, so a non-CF taxon that happens
    * to share a CF taxon's parent id is re-keyed to the parent too.
    * That is exactly what the reference's `left_join(parent_records,
    * by = "parentNameUsageID")` does (Rmd:1040-1049 — no CF predicate
    * on the join), and bug-compatible output is the contract here (the
    * taxa-cleaner shadowing rule); the q57 oracle mirrors the same
    * join. Do NOT "fix" this by gating on sflag without a reference
    * change to cite.
    *
    * @param classNames (class, class_clean, sflag, scientificname,
    *                   aphia_id, parentNameUsageID)
    * @param parents    WoRMS records (AphiaID, scientificname)
    */
  def substituteCfParents(classNames: DataFrame, parents: DataFrame): DataFrame = {
    val cfParentIds = classNames
      .filter(col("sflag") === "CF")
      .select(col("parentNameUsageID")).distinct()
    val parentRecords = parents
      .select(col("AphiaID").as("parentNameUsageID"),
        col("scientificname").as("parentName"))
      .join(cfParentIds, Seq("parentNameUsageID"), "left_semi")
    classNames
      .join(broadcast(parentRecords), Seq("parentNameUsageID"), "left")
      .withColumn("scientificname",
        coalesce(col("parentName"), col("scientificname"), col("class_clean")))
      .withColumn("aphia_id",
        coalesce(
          when(col("parentName").isNotNull, col("parentNameUsageID")),
          col("aphia_id")))
      .withColumn("sflag",
        when(col("sflag") === "CF", lit(null).cast("string"))
          .otherwise(col("sflag")))
      .drop("parentNameUsageID", "parentName")
  }
}
