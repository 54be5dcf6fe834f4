package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S11 directory-listing scan (SURVEY.md §2.1): the file inventory as a
  * table (reference: ifcb-dashboard-metadata-pipeline.Rmd:705-714;
  * code/merge_training_datasets/01_create_file_index.R:22-49 — `files`,
  * `pid` extracted from name).
  *
  * Spark-first: `binaryFile` format scans any directory tree in parallel
  * and exposes (path, modificationTime, length) without reading contents
  * (`content` is pruned unless selected). New-bin detection (§2.9) is a
  * left-anti join of this index against the processed log.
  */
object FileIndex {

  /** File inventory with the bin/sample id decoded from the file name. */
  def list(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        col("path"),
        col("length"),
        col("modificationTime"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("filename"),
        regexp_extract(col("path"), HdrSource.SampleIdPattern, 1).as("sample"))

  /** J10/§2.9 new-data detection: files not yet in `processed`
    * (reference anti-join at code/ifcb_ingest_and_qc.R:173-181).
    */
  def newFiles(index: DataFrame, processed: DataFrame, key: String = "sample"): DataFrame =
    index.join(processed.select(col(key)).distinct(), Seq(key), "left_anti")

  /** Oversize/empty guards with a dead-letter side (reference: skip >0.5 GB
    * bins + log, ifcb_ingest_and_qc.R:113-141; empty-bin exclusion :190-197).
    * Returns (clean, deadLetter).
    */
  def sizeGate(index: DataFrame, maxBytes: Long): (DataFrame, DataFrame) = {
    val dead = index.filter(col("length") === 0L || col("length") > maxBytes)
      .withColumn("reason",
        when(col("length") === 0L, "empty").otherwise("oversize"))
    (index.filter(col("length") > 0L && col("length") <= maxBytes), dead)
  }
}
