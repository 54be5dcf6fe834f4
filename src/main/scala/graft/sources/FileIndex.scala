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

  /** File inventory with the bin/sample id decoded from the file name.
    *
    * Listed via the Hadoop FileSystem, not the `binaryFile` source:
    * binaryFile silently omits 0-byte files, and the empty-bin gate
    * (ifcb_ingest_and_qc.R:190-197) exists precisely to catch those.
    * Driver-side listing is what Spark's own InMemoryFileIndex does for
    * any scan; payload reads stay distributed (see [[RoiSource]]).
    */
  def list(spark: SparkSession, path: String, glob: String = "*"): DataFrame = {
    import spark.implicits._
    val pattern = new org.apache.hadoop.fs.Path(path, glob)
    val fs = pattern.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(pattern)).map(_.toSeq).getOrElse(Nil)
      .filter(_.isFile)
      .map(s => (s.getPath.toString, s.getLen,
        new java.sql.Timestamp(s.getModificationTime)))
    statuses.toDF("path", "length", "modificationTime")
      .select(
        col("path"),
        col("length"),
        col("modificationTime"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("filename"),
        regexp_extract(col("path"), HdrSource.SampleIdPattern, 1).as("sample"))
  }

  /** J10/§2.9 new-data detection: files not yet in `processed`
    * (reference anti-join at code/ifcb_ingest_and_qc.R:173-181).
    *
    * Files without an identity (empty/null key — e.g. a file whose name
    * carries no IFCB sample id, which [[index]] extracts as "") always
    * pass through as new: a plain anti-join would collapse ALL id-less
    * files onto one key, so a single processed id-less file would
    * permanently suppress every other one (round-11 review).
    * Re-processing an id-less straggler each run is the safe failure
    * mode; permanent silent suppression is not.
    */
  def newFiles(index: DataFrame, processed: DataFrame, key: String = "sample"): DataFrame = {
    // emptiness test on the stringified key: comparing a numeric key
    // column against "" would ANSI-fail the cast
    val k = col(key).cast("string")
    val idless = index.filter(k.isNull || k === "")
    index.filter(k.isNotNull && k =!= "")
      .join(processed.select(col(key)).distinct()
        .filter(col(key).cast("string").isNotNull &&
          col(key).cast("string") =!= ""), Seq(key), "left_anti")
      .unionByName(idless)
  }

  /** [[newFiles]] with a broadcast Bloom-filter pre-gate, for the scale
    * where the processed log holds billions of keys. Spark's runtime
    * bloom filters (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
    * never apply to anti joins — each probe row must be checked, not
    * pruned — so the plain form shuffles the FULL index against the FULL
    * log every scheduled run even when almost everything is already
    * processed.
    *
    * Here the log is sketched once (one scan, no shuffle), the sketch is
    * broadcast, and the index splits into "definitely new" (bloom miss —
    * no false negatives, these rows never shuffle) and "maybe processed"
    * (bloom hit), with only the maybes going through the exact anti-join
    * to strip false positives. The result is exactly [[newFiles]]; at
    * `fpp` = 1% the shuffled probe side shrinks ~100× on a steady-state
    * incremental run.
    *
    * @param expectedItems sizing for the sketch — overestimate freely,
    *                      the sketch is ~1.2 bytes/item at 1% fpp
    */
  def newFilesBloom(
      index: DataFrame,
      processed: DataFrame,
      key: String = "sample",
      expectedItems: Long = 1L << 24,
      fpp: Double = 0.01): DataFrame = {
    // build AND probe over the stringified key: bloomFilter() inserts a
    // numeric column's native longs, while the probe below hashes UTF-8
    // bytes — mixed representations would make membership effectively
    // random and break the no-false-negatives invariant for non-string
    // keys (LongType sample ids would mass re-ingest)
    val keyStr = col(key).cast("string")
    val bf = processed.select(keyStr.as(key)).stat
      .bloomFilter(key, expectedItems, fpp)
    val bfB = index.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => s != null && bfB.value.mightContainString(s))
    // the index is a directory LISTING (bounded, no column pruning to
    // lose): evaluating the probe in two complementary filters trades a
    // second listing-scan for not forcing a persist on the caller
    val definitelyNew = index.filter(!mightContain(keyStr))
    val maybeProcessed = index.filter(mightContain(keyStr))
    definitelyNew.unionByName(
      newFiles(maybeProcessed, processed.select(col(key)), key))
  }

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
