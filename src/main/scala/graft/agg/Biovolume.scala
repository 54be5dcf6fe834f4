package graft.agg

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Biovolume → carbon biomass math — SURVEY.md §2.4 A18, the pipeline's
  * workhorse rollup (reference: `ifcb_summarize_biovolumes` call sites
  * ifcb-data-pipeline.Rmd:476-486; per-liter math Rmd:1410).
  *
  * The carbon conversion is the published Menden-Deuer & Lessard (2000)
  * piecewise power law: diatoms use one coefficient pair, other protists a
  * size-dependent pair. Expressed as a pure column expression so it runs
  * inside whole-stage codegen *before* the aggregation (per-row carbon,
  * then one grouped sum — map-side partial aggregation applies).
  */
object Biovolume {

  /** Carbon (pg/cell) from biovolume (µm³/cell), MDL2000:
    * diatoms: C = 0.288·V^0.811; non-diatoms: C = 0.216·V^0.939 below
    * 3000 µm³, 0.117·V^0.881 above.
    */
  def carbonPg(isDiatom: Column, volUm3: Column): Column =
    when(isDiatom, lit(0.288) * pow(volUm3, 0.811))
      .otherwise(
        when(volUm3 > 3000.0, lit(0.117) * pow(volUm3, 0.881))
          .otherwise(lit(0.216) * pow(volUm3, 0.939)))

  /** counts/ml → per-liter scaling (Rmd:1409-1411 `COEFF = 1000/ml`).
    * Zero analyzed volume yields NULL, not a crash (round-12 review):
    * Spark 4 ANSI mode throws DIVIDE_BY_ZERO even for doubles, so one
    * aborted-run sample row (IngestQc.sampleMetrics emits ml = 0.0 when
    * runTime == inhibitTime) would abort a whole delivery/alert job.
    * NULL is also exactly what DuckDB's `/` returns for a zero divisor,
    * so the q37/q73 oracle mirrors hold without a CASE on their side.
    */
  def perLiter(x: Column, mlAnalyzed: Column): Column =
    when(mlAnalyzed =!= 0.0, x / mlAnalyzed * 1000.0)
}
