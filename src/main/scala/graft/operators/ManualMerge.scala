package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Manual-dataset merge with class-list reconciliation — the
  * `ifcb_merge_manual` curation flow (reference call sites:
  * code/annotations/ifcb_merge_classifiers.R:34-56, merging two
  * (class2use config, manual-annotation folder) datasets into one):
  * union the class lists by NAME (base order preserved, new classes
  * appended), remap the addition's label indices into the merged list,
  * and surface samples annotated in both datasets as conflicts instead
  * of silently double-counting them.
  *
  * Scale shape: class lists are O(100) rows — they broadcast, and the
  * appended-index window's single partition is bounded by the class
  * count, never by data volume. The annotation frames only ever flow
  * through broadcast joins on (class idx | name) and an anti join on the
  * conflict samples: no shuffle of the big side beyond what the caller
  * already has.
  */
object ManualMerge {

  /** What happens to samples annotated in BOTH datasets. */
  sealed trait ConflictPolicy
  /** Keep the base dataset's annotations for conflicted samples (default:
    * the base is the curated set being extended). */
  case object BaseWins extends ConflictPolicy
  /** Keep the addition's annotations for conflicted samples. */
  case object AddWins extends ConflictPolicy
  /** Refuse to merge when any conflict exists (throws). */
  case object Fail extends ConflictPolicy

  /** @param class2use   merged class list (class_idx, class_name) —
    *                    base indices unchanged, new classes appended
    * @param annotations merged (sample, roi_number, manual_idx,
    *                    class_name) with the addition remapped
    * @param conflicts   (sample, n_base, n_add) for samples annotated in
    *                    both inputs — empty unless the curators overlap
    */
  final case class Merged(
      class2use: DataFrame, annotations: DataFrame, conflicts: DataFrame)

  /** Merge `(c2uAdd, annAdd)` into `(c2uBase, annBase)`.
    *
    * Inputs follow the [[graft.sources.MatSource]] relational views:
    * class2use frames are (class_idx, class_name) with 1-based indices;
    * annotation frames carry (sample, roi_number, manual_idx), where
    * `manual_idx` indexes the OWN dataset's class list (null =
    * unannotated ROI — preserved, never remapped to a class).
    */
  def merge(
      c2uBase: DataFrame, c2uAdd: DataFrame,
      annBase: DataFrame, annAdd: DataFrame,
      policy: ConflictPolicy = BaseWins): Merged = {

    // class reconciliation BY NAME: base keeps its indices; add-only
    // classes append in their own index order after the base maximum
    // (coalesce: an empty base merges as a pure relabel from index 0)
    val maxBase = c2uBase
      .agg(coalesce(max(col("class_idx")), lit(0)).as("__max"))
    val appended = c2uAdd
      .join(c2uBase.select(col("class_name")), Seq("class_name"), "left_anti")
      .withColumn("__rn", row_number().over(Window.orderBy(col("class_idx"))))
      .crossJoin(broadcast(maxBase))
      .select((col("__max") + col("__rn")).cast("int").as("class_idx"),
        col("class_name"))
    val merged = c2uBase
      .select(col("class_idx").cast("int"), col("class_name"))
      .unionByName(appended)

    // "annotated in both" counts REAL annotations only: every manual
    // dataset lists all its ROIs with manual_idx null for unannotated
    // ones, so counting placeholder rows manufactured phantom conflicts
    // (and AddWins then replaced a sample's curated base annotations
    // with the addition's all-null listing — round-11 review)
    val conflicts = annBase.filter(col("manual_idx").isNotNull)
      .groupBy(col("sample"))
      .agg(count(lit(1)).as("n_base"))
      .join(annAdd.filter(col("manual_idx").isNotNull)
        .groupBy(col("sample")).agg(count(lit(1)).as("n_add")),
        Seq("sample"))
    // every OVERLAPPING sample still needs exactly one side's ROI
    // listing in the output (both sides' rows would double-list the
    // ROIs); non-conflict overlaps resolve to the side that actually
    // carries annotations — the policy only arbitrates real conflicts
    val overlap = annBase.select(col("sample")).distinct()
      .join(annAdd.select(col("sample")).distinct(), Seq("sample"))
    val bReal = annBase.filter(col("manual_idx").isNotNull)
      .select(col("sample")).distinct()
    val aReal = annAdd.filter(col("manual_idx").isNotNull)
      .select(col("sample")).distinct()
    val addOnlyReal = overlap.join(aReal, Seq("sample"))
      .join(bReal, Seq("sample"), "left_anti")

    policy match {
      case Fail =>
        val n = conflicts.count()
        require(n == 0,
          s"manual merge: $n samples are annotated in both datasets " +
            "(pass BaseWins/AddWins to resolve)")
      case _ => ()
    }

    // remap the addition: own idx → name → merged idx. Unknown indices
    // (not in c2uAdd) and nulls keep a null class — they surface rather
    // than silently joining away the ROI.
    val mergedDim = merged
      .select(col("class_idx").as("__midx"), col("class_name"))
    val remapped = annAdd
      .join(broadcast(c2uAdd.select(col("class_idx").as("manual_idx"),
        col("class_name"))), Seq("manual_idx"), "left")
      .join(broadcast(mergedDim), Seq("class_name"), "left")
      .select(col("sample"), col("roi_number"),
        col("__midx").as("manual_idx"), col("class_name"))

    // resolve base indices against the BASE class list, not `merged`
    // (round-13 review): base indices are unchanged by the merge, but a
    // dangling base manual_idx (class deleted from the base config)
    // would match a newly APPENDED class's index in `merged` and
    // silently acquire its name — the exact silent-mislabel this
    // file's unknown-indices-surface contract forbids; against the
    // base list it stays a null class and surfaces
    val baseNamed = annBase
      .select(col("sample"), col("roi_number"), col("manual_idx"))
      .join(broadcast(c2uBase.select(col("class_idx").cast("int").as("manual_idx"),
        col("class_name"))), Seq("manual_idx"), "left")
      .select(col("sample"), col("roi_number"), col("manual_idx"),
        col("class_name"))

    // samples whose listing comes from the ADDITION: real conflicts when
    // the policy says so, plus overlaps only the addition annotated;
    // every other overlapping sample keeps the base listing
    val addWinsSamples = (policy match {
      case AddWins => conflicts.select(col("sample")).unionByName(addOnlyReal)
      case _ => addOnlyReal
    }).distinct()
    val baseWinsSamples = overlap.join(addWinsSamples, Seq("sample"), "left_anti")
    val annotations = baseNamed
      .join(addWinsSamples, Seq("sample"), "left_anti")
      .unionByName(
        remapped.join(baseWinsSamples, Seq("sample"), "left_anti"))
    Merged(merged, annotations, conflicts)
  }

  /** Targeted bulk relabel — `ifcb_correct_annotation` as called by
    * code/annotations/correct_annotation.R:8-11: a curator reviews a
    * class (e.g. the Scrippsiella screening of
    * code/annotations/scrippsiella_round.R, an eccentricity filter over
    * the EcoTaxa export) and hands back a file of image names whose
    * manual label must change to `newIdx`.
    *
    * `selectedImages` carries one image filename per row
    * (`D..._IFCBnnn_00042.png` — sample id + zero-padded ROI, the
    * SqliteSource.annotations `image_name` convention); the (sample,
    * roi_number) pairs are parsed out, broadcast (a human-curated list
    * is always small), and only matching rows of the manual classlist
    * get `manual_idx = newIdx`. Unannotated ROIs (null `manual_idx`)
    * matched by the list are annotated too, exactly like matched
    * annotated ones; everything else passes through untouched.
    */
  def correctAnnotation(manual: DataFrame, selectedImages: DataFrame,
      imageCol: String, newIdx: Int): DataFrame = {
    val base = regexp_replace(trim(col(imageCol)), "\\.[^.]*$", "")
    val roiStr = regexp_extract(base, "_([0-9]+)$", 1)
    val parsed = selectedImages
      .select(
        trim(col(imageCol)).as("__raw"),
        regexp_replace(base, "_[0-9]+$", "").as("sample"),
        // regexp_extract yields "" on no match — an ANSI cast would
        // throw on such rows, so gate before casting
        when(roiStr =!= "", roiStr.cast("int")).as("roi_number"))
    // fail loudly on unparseable names (round-13 review): silently
    // dropping a row means the curator's requested correction is
    // skipped with no signal — mislabeled training data. Empty/blank
    // rows are tolerated (trailing newline artifacts).
    val bad = parsed
      .filter(col("roi_number").isNull && col("__raw") =!= "")
      .select(col("__raw")).limit(5)
      .collect().map(_.getString(0))
    require(bad.isEmpty,
      s"correctAnnotation: unparseable image name(s) ${bad.mkString("'", "', '", "'")}" +
        " — expected <sample>_<roi>.<ext>; fix the selection list rather" +
        " than silently skipping the correction")
    val sel = parsed
      .filter(col("roi_number").isNotNull)
      .select(col("sample"), col("roi_number"))
      .distinct()
      .withColumn("__selected", lit(true))
    // the same loud contract for PARSEABLE selections that match no
    // manual row (round-14 review: a path-prefixed or wrong-dataset
    // name parsed fine, joined to nothing, and the requested correction
    // vanished with no signal — the exact silent skip the check above
    // exists to prevent, one step later)
    val unmatched = sel
      .join(manual.select(col("sample"), col("roi_number")).distinct(),
        Seq("sample", "roi_number"), "left_anti")
      .limit(5).collect()
      .map(r => s"${r.get(0)}_${r.get(1)}")
    require(unmatched.isEmpty,
      s"correctAnnotation: selection(s) ${unmatched.mkString("'", "', '", "'")}" +
        " match no manual row — wrong dataset or mangled sample ids; fix" +
        " the selection list rather than silently skipping the correction")
    manual
      .join(broadcast(sel), Seq("sample", "roi_number"), "left")
      .withColumn("manual_idx",
        when(col("__selected"), lit(newIdx)).otherwise(col("manual_idx")))
      .drop("__selected")
  }
}
