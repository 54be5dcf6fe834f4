package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2 HDR metadata source (SURVEY.md §2.1): the instrument's `key: value`
  * text headers → one typed metadata row per file (reference:
  * `ifcb_read_hdr_data` call at ifcb-data-pipeline.Rmd:246; produced
  * columns listed at Rmd:253-254).
  *
  * Spark-first shape: `spark.read.text` with `input_file_name()` as the
  * grain key, a relational pivot from key/value lines to columns — no
  * custom FileFormat needed; the text scan is splittable and parallel, and
  * the per-file aggregation is one hash shuffle on file name. The sample
  * id (`DYYYYMMDDTHHMMSS_IFCBnnn`) and its timestamp are decoded from the
  * file name exactly as the reference does from bin ids
  * (code/ifcb_ingest_and_qc.R:194,213).
  */
object HdrSource {

  val SampleIdPattern = "(D\\d{8}T\\d{6}_IFCB\\d+)"

  /** Reads a directory of `.hdr` files into one row per sample. `keys`
    * selects which header keys become columns (double-typed when
    * `numeric`). A garbled header that repeats a key keeps the FIRST
    * occurrence (file order) instead of crashing map construction with
    * DUPLICATED_MAP_KEY — found by RoiFuzzSpec's HDR fuzz (round 10);
    * one corrupt header must not kill a whole ingest run.
    */
  def read(
      spark: SparkSession,
      path: String,
      stringKeys: Seq[String],
      numericKeys: Seq[String]): DataFrame =
    read(spark, Seq(path), stringKeys, numericKeys)

  /** Multi-path overload (round-12 review): incremental callers pass
    * the explicit file list of the bins under processing instead of the
    * whole-archive glob — a decade-deep archive must not re-read every
    * historical header per scheduled run.
    */
  def read(
      spark: SparkSession,
      paths: Seq[String],
      stringKeys: Seq[String],
      numericKeys: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "HdrSource.read: empty path list")
    // a glob matching ZERO files throws PATH_NOT_FOUND eagerly on the
    // driver — but an .hdr-less archive is a designed degraded state
    // (per-bin missing headers already coalesce to -999 positions
    // downstream), so all-missing must yield an EMPTY header frame,
    // not kill the scheduled run (round-13 review)
    val lines0 =
      try spark.read.text(paths: _*)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
          import spark.implicits._
          spark.emptyDataset[String].toDF("value")
      }
    val lines = lines0
      // line order within a file: ids rise with partition index then row
      // position, and a file's splits are offset-ordered
      .withColumn("__ord", monotonically_increasing_id())
      .withColumn("file", input_file_name())
      .withColumn("sample", regexp_extract(col("file"), SampleIdPattern, 1))
      // files whose names carry no IFCB sample id all extract "" and
      // the per-sample groupBy would MERGE them into one chimera row of
      // first-wins values from unrelated files — drop them, the
      // RoiSource.images discipline (round-11 review)
      .filter(col("sample") =!= "")
      .withColumn("key", trim(regexp_extract(col("value"), "^([^:]+):", 1)))
      .withColumn("v", trim(regexp_extract(col("value"), "^[^:]+:(.*)$", 1)))
      .filter(col("key") =!= "")
    val kv = lines
      .groupBy(col("sample"), col("key"))
      .agg(min_by(col("v"), col("__ord")).as("v"))
      .groupBy(col("sample"))
      .agg(map_from_entries(collect_list(struct(col("key"), col("v")))).as("kv"))
    val typed = stringKeys.map(k => element_at(col("kv"), k).as(k)) ++
      numericKeys.map(k => element_at(col("kv"), k).cast("double").as(k))
    kv.select(
      (col("sample") +:
        toTimestampFromSampleId(col("sample")).as("timestamp") +:
        typed): _*)
  }

  /** Filename→timestamp codec (`ifcb_convert_filenames`, Rmd:769):
    * D20240101T123000_IFCB134 → 2024-01-01 12:30:00 UTC. try_, not
    * strict (round-12 review): a name matching the id shape but
    * encoding an invalid date (D20231399T256090) yields NULL instead of
    * aborting the whole run under ANSI — callers gate on it
    * (IngestQc.run dead-letters such bins as `bad_sample_date`).
    */
  def toTimestampFromSampleId(sample: org.apache.spark.sql.Column) =
    try_to_timestamp(
      regexp_extract(sample, "D(\\d{8}T\\d{6})", 1), lit("yyyyMMdd'T'HHmmss"))
}
