package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Particle-size-distribution power-law fit — SURVEY.md §2.4 A17
  * (reference: `ifcb_psd` call ifcb-data-pipeline.Rmd:652-669; per-sample
  * size histogram → power-curve fit → params + R² + rule-based flags).
  *
  * The fit is ordinary least squares on the log-log linearization
  * ln(n) = ln(a) − k·ln(x): a power law n = a·x^−k over histogram bins.
  * Both implementations accumulate only *symmetric moments* (Σx, Σy, Σxx,
  * Σxy, Σyy, count) — no data-order-dependent state (SURVEY.md §7.4 risk
  * 5). The DataFrame form with decimal-cast sums (see q38) is exactly
  * order-independent; the double-buffer Aggregator is order-independent
  * up to fp rounding (~1e-13 relative).
  *
  * Two forms:
  *  - [[PsdFit.moments]]: plain DataFrame expressions (codegen, oracle-
  *    checkable in SQL) — preferred in the relational path;
  *  - [[PsdFit]] the typed `Aggregator`, for `Dataset`/UDAF callers
  *    (registered via `udaf(...)`), demonstrating the custom-aggregate
  *    surface the PSD fit genuinely needs at 100 TB (single pass, no
  *    per-sample collect).
  */
final case class FitResult(slope: Double, intercept: Double, r2: Double, nBins: Long)

private[agg] final case class FitBuf(
    var n: Long, var sx: Double, var sy: Double,
    var sxx: Double, var sxy: Double, var syy: Double)

/** Input: (lnX, lnY) — one histogram bin per row. */
class PsdFit extends Aggregator[(Double, Double), FitBuf, FitResult] {
  override def zero: FitBuf = FitBuf(0L, 0.0, 0.0, 0.0, 0.0, 0.0)

  override def reduce(b: FitBuf, in: (Double, Double)): FitBuf = {
    val (x, y) = in
    b.n += 1; b.sx += x; b.sy += y
    b.sxx += x * x; b.sxy += x * y; b.syy += y * y
    b
  }

  override def merge(a: FitBuf, b: FitBuf): FitBuf = {
    a.n += b.n; a.sx += b.sx; a.sy += b.sy
    a.sxx += b.sxx; a.sxy += b.sxy; a.syy += b.syy
    a
  }

  override def finish(b: FitBuf): FitResult = PsdFit.solve(b)

  override def bufferEncoder: Encoder[FitBuf] = Encoders.product[FitBuf]
  override def outputEncoder: Encoder[FitResult] = Encoders.product[FitResult]
}

object PsdFit {

  private[agg] def solve(b: FitBuf): FitResult = {
    if (b.n < 2) return FitResult(Double.NaN, Double.NaN, Double.NaN, b.n)
    val det = b.n * b.sxx - b.sx * b.sx
    if (det == 0.0) return FitResult(Double.NaN, Double.NaN, Double.NaN, b.n)
    val slope = (b.n * b.sxy - b.sx * b.sy) / det
    val intercept = (b.sy - slope * b.sx) / b.n
    val varY = b.n * b.syy - b.sy * b.sy
    val r2 =
      if (varY == 0.0) 1.0
      else {
        val num = b.n * b.sxy - b.sx * b.sy
        num * num / (det * varY)
      }
    FitResult(slope, intercept, r2, b.n)
  }

  /** DataFrame form: aggregate expressions producing (slope, intercept,
    * r2, n_bins) from lnX/lnY columns inside an existing `groupBy.agg`.
    *
    * Two invariants (round-12 review):
    *  - every moment — INCLUDING `fit_n` — aggregates the same
    *    complete-pair population. `count(lit(1))` with null-skipping
    *    sums would silently skew n against the sums whenever a log()
    *    input is non-positive, producing numerically wrong (not null)
    *    fit parameters;
    *  - sums go through the decimal cast ([[graft.GraftQuery.dsum]],
    *    q38 discipline), so the fit is bit-identical under any
    *    partitioning — the header's order-independence claim, which
    *    previously held only for q38's inlined copy while this form
    *    (IngestQc.psd) drifted in the last ulps and could flip a
    *    threshold-straddling flag between runs.
    */
  def moments(lnX: Column, lnY: Column): Seq[(String, Column)] = {
    val pair = lnX.isNotNull && lnY.isNotNull
    def d(c: Column) =
      graft.GraftQuery.dsum(when(pair, c), graft.GraftQuery.D12)
    Seq(
      "fit_n" -> count(when(pair, 1)),
      "fit_sx" -> d(lnX), "fit_sy" -> d(lnY),
      "fit_sxx" -> d(lnX * lnX), "fit_sxy" -> d(lnX * lnY),
      "fit_syy" -> d(lnY * lnY))
  }

  /** Post-agg solve from the [[moments]] columns. Degenerate fits
    * (fewer than 2 bins, or all bins at one x — det = 0) yield null,
    * the Column twin of [[solve]]'s NaN contract; the guarded CaseWhen
    * branches keep the divisions ANSI-safe.
    */
  def solveCols(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
      syy: Column): (Column, Column, Column) = {
    val det = n * sxx - sx * sx
    val ok = n >= 2 && det =!= 0.0
    val slope = when(ok, (n * sxy - sx * sy) / det)
    val intercept = when(ok, (sy - slope * sx) / n)
    val num = n * sxy - sx * sy
    val varY = n * syy - sy * sy
    val r2 = when(ok && varY === 0.0, 1.0)
      .when(ok, num * num / (det * varY))
    (slope, intercept, r2)
  }

  /** Simplified engine-label flag chain — an intentionally reduced
    * 3-rule subset (lowercase engine vocabulary) kept for q38's oracle
    * mirror and for callers that have only fit outputs. The
    * reference-parameterized 7-threshold rule set is [[flags7]]; that is
    * what [[graft.jobs.IngestQc.psd]] emits into the delivery path.
    */
  /** Degenerate fits (NULL slope/r2 from the k>=2 / nonzero-det guards:
    * a single-bin histogram or all bins at one size) flag `flat_psd`
    * explicitly. Without the branch a NULL falls through every WHEN to
    * `ok` — an unfittable PSD reported as passing QC (round-12 review).
    * `flat_psd` matches the pre-guard behavior, when slope was NaN and
    * both engines' NaN-is-greatest `slope > -0.1` fired this branch.
    */
  def flag(slope: Column, r2: Column, totalCount: Column): Column =
    when(totalCount < 50L, "incomplete")
      .when(slope.isNull || r2.isNull, "flat_psd")
      .when(r2 < 0.55, "poor_fit")
      .when(slope > -0.1, "flat_psd")
      .otherwise("ok")

  /** The reference's tunable PSD QC thresholds, defaults mirroring the
    * production `ifcb_psd` call (ifcb_ingest_and_qc.R:505-516; the Rmd
    * variant at ifcb-data-pipeline.Rmd:652-669 differs only in
    * missing_cells/biomass/micron_factor). `beads = 1e20` reproduces the
    * reference's "disabled by an unreachable threshold" idiom.
    *
    *  - `rSqr`:        minimum acceptable fit R² (`r_sqr`)
    *  - `beads`:       max count in the peak size class (`beads`)
    *  - `bubbles`:     max ESD µm of the most abundant size class (`bubbles`)
    *  - `incompleteCount`/`incompleteVolumeMl`: minimum total particle
    *                   count and analyzed volume (`incomplete = c(1500, 3)`)
    *  - `missingCells`: minimum ratio of imaged ROIs to ADC triggers
    *                   (`missing_cells`)
    *  - `biomass`:     minimum particle concentration, counts/mL (`biomass`)
    *  - `bloom`:       max µm the peak size class may sit above the fit
    *                   start before the sample reads as a monospecific
    *                   bloom (`bloom`)
    *  - `humidity`:    max instrument humidity %, from the HDR (`humidity`)
    */
  final case class FlagParams(
      rSqr: Double = 0.5,
      beads: Double = 1e20,
      bubbles: Double = 110.0,
      incompleteCount: Long = 1500L,
      incompleteVolumeMl: Double = 3.0,
      missingCells: Double = 0.5,
      biomass: Double = 3000.0,
      bloom: Double = 10.0,
      humidity: Double = 75.0)

  /** Full reference-vocabulary QC flag (single flag per sample via a
    * priority chain in the `ifcb_psd` signature's threshold order, then
    * the R² gate). Vocabulary pinned by the reference's own consumers:
    * `skip_flags = c("Bubbles", "Incomplete Run", "Beads")`
    * (ifcb_ingest_and_qc.R:53) and the delivery's case-insensitive
    * substring drop of `bubbles`/`incomplete`
    * (ifcb_delivery_data_to_shark.R:44,412-434).
    *
    * A rule whose input metric is null (e.g. no HDR humidity recorded,
    * no trigger inventory) is disabled, not fired — a missing instrument
    * metric must not flag a sample bad.
    *
    * @param peakEsdUm    ESD µm of the most abundant size class
    * @param peakN        count in that size class
    * @param totalCount   total particles in the sample
    * @param triggerCount ADC trigger count (imaged + unimaged)
    * @param mlAnalyzed   analyzed volume, mL
    * @param humidityPct  instrument humidity from the HDR
    * @param startFitUm   fit start (`start_fit`), the bloom rule's origin
    */
  /** Null policy: a null INSTRUMENT metric (humidity, volume, trigger
    * count — an HDR that lacks the key) disables its rule, never fires
    * it. A null `r2` is different (round-12 review): every in-repo r2
    * source is the fit itself, so null means the PSD was UNFITTABLE
    * (fewer than 2 bins, or all bins at one size — [[solveCols]]'s
    * degenerate-fit guard), and it fires `Poor Fit` — the twin of
    * [[flag]]'s explicit degenerate branch. This deliberately deviates
    * from the reference's NA-dropping `which(psd$R.2 < r_sqr)`, which
    * would ship an unfittable sample to delivery flagged ok.
    */
  def flags7(p: FlagParams, startFitUm: Double)(
      r2: Column, peakEsdUm: Column, peakN: Column,
      totalCount: Column, triggerCount: Column,
      mlAnalyzed: Column, humidityPct: Column): Column = {
    def fires(c: Column): Column = coalesce(c, lit(false))
    when(fires(peakN > p.beads), "Beads")
      .when(fires(peakEsdUm > p.bubbles), "Bubbles")
      .when(fires(totalCount < p.incompleteCount) ||
        fires(mlAnalyzed < p.incompleteVolumeMl), "Incomplete Run")
      // zero-divisor guards (round-12 review): ANSI division THROWS on
      // trigger_count = 0 / ml = 0; the when(...) form nulls instead,
      // which fires() treats as rule-disabled — the same outcome as
      // DuckDB's null-on-zero `/` in the q88 oracle
      .when(fires(when(triggerCount =!= 0L,
        totalCount.cast("double") / triggerCount) < p.missingCells),
        "Missing Cells")
      .when(fires(when(mlAnalyzed =!= 0.0,
        totalCount / mlAnalyzed) < p.biomass), "Low Biomass")
      .when(fires(peakEsdUm - startFitUm > p.bloom), "Bloom")
      .when(fires(humidityPct > p.humidity), "High Humidity")
      // isnan too (round-13 review): the typed-Aggregator pathway's
      // unfittable result is FitResult(NaN,..), not null — NaN is not
      // null and NaN < rSqr is FALSE under NaN-greatest ordering, so
      // an unfittable sample fell through every rule to "ok"
      .when(r2.isNull || isnan(r2) || r2 < p.rSqr, "Poor Fit")
      .otherwise("ok")
  }
}
