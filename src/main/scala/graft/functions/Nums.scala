package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric column functions — SURVEY.md §2.8 math family. */
object Nums {

  /** `signif(x, digits)` for positive x ≥ 1 (reference:
    * ifcb-data-pipeline.Rmd:1398-1443 `signif(x, 6)` presentation
    * rounding). The decimal exponent is derived from the string length of
    * the integer part — exact integer/string ops — rather than log10,
    * whose floor is unstable at power-of-ten boundaries across engines.
    */
  def signifPos(x: Column, digits: Int): Column = {
    val e = length(floor(x).cast("long").cast("string")) // decimal exponent + 1
    val scale = pow(lit(10.0), (e - lit(digits)).cast("double"))
    // bround, not round (round-13 review): R's signif rounds half to
    // EVEN (IEC 60559) — signif(123450, 4) = 123400 — while Spark's
    // round() is HALF_UP; the DuckDB mirror uses round_even to match
    bround((x / scale).cast("double"), 0) * scale
  }

  /** Harmonic mean 2ab/(a+b) — the F1 shape (Rmd:909). */
  def harmonic(a: Column, b: Column): Column =
    when(a + b =!= 0.0, lit(2.0) * a * b / (a + b))
}
