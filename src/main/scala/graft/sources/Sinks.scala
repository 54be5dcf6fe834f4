package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output sinks K1-K3 (SURVEY.md §2.1).
  *
  * K1: SHARK delivery TSV — tab-separated, empty string for null
  * (reference: Rmd:1493,1560 `na = ""`).
  * K2: per-class partitioned TSV — one folder per class (reference:
  * EcoTaxa export, ifcb-image-export-pipeline.Rmd:793-830); Spark's
  * `partitionBy` gives the directory layout and writes all classes in
  * one pass instead of the reference's per-class loop.
  * K3: CSV append (dashboard metadata / PSD results,
  * ifcb_ingest_and_qc.R:425-427,526-528).
  */
object Sinks {

  /** K1: delivery TSV with header, nulls as empty. */
  def deliveryTsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true").option("nullValue", "")
      .option("emptyValue", "")
      .csv(path)

  /** K2: one TSV directory per value of `classCol`, all classes written in
    * a single pass. When `formatCodes` is given, a synthetic first row of
    * per-column format codes (the EcoTaxa `[t]`/`[f]` convention,
    * ifcb-image-export-pipeline.Rmd:809-813) is emitted at the top of each
    * class's file: the code row carries rank 0, data rank 1, and rows are
    * sorted within each class partition before the write.
    */
  def partitionedTsv(
      df: DataFrame, classCol: String, path: String,
      formatCodes: Option[Map[String, String]] = None): Unit = {
    val writerDf = formatCodes match {
      case None => df.repartition(col(classCol))
      case Some(codes) =>
        val asStr = df.select(df.columns.map(c => col(c).cast("string").as(c)): _*)
        val classes = df.select(col(classCol)).distinct()
        val codeRows = classes.select(asStr.columns.map {
          case `classCol` => col(classCol)
          case c => lit(codes.getOrElse(c, "[t]")).as(c)
        }: _*)
        codeRows.withColumn("__rank", lit(0))
          .unionByName(asStr.withColumn("__rank", lit(1)))
          .repartition(col(classCol))
          .sortWithinPartitions(col(classCol), col("__rank"))
          .drop("__rank")
    }
    writerDf.write.mode(SaveMode.Overwrite)
      .partitionBy(classCol)
      .option("sep", "\t").option("header", "true").option("nullValue", "")
      .csv(path)
  }

  /** K3: idempotent append — new rows are anti-joined against what the
    * sink already holds before writing, making re-runs safe (the
    * reference appends to CSVs keyed by sample and dedupes by hand).
    */
  def appendNew(df: DataFrame, existing: Option[DataFrame], key: Seq[String],
      path: String): Unit = {
    val fresh = existing match {
      case Some(e) => df.join(e.select(key.map(col): _*).distinct(), key, "left_anti")
      case None => df
    }
    fresh.write.mode(SaveMode.Append).option("header", "true").csv(path)
  }
}
