package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String-normalization column functions — SURVEY.md §2.8 string family.
  * Pure expression trees (codegen-friendly, no UDFs).
  */
object Strings {

  /** Sequential regex-replace pipeline — the taxa-name cleaner shape
    * (reference: ifcb-data-pipeline.Rmd:936-971, 15+ chained `gsub`;
    * richer rule sets at code/utils/clean_taxa_fn.R:31-64). Rules apply
    * in order; Catalyst folds the chain into one codegen stage.
    */
  def regexClean(rules: Seq[(String, String)])(c: Column): Column =
    rules.foldLeft(c) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }

  /** `str_to_sentence` (Rmd:762): first char upper, rest lower. */
  def sentenceCase(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(c.substr(lit(2), length(c))))

  /** `str_squish`: trim + collapse internal whitespace runs. */
  def squish(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))
}
