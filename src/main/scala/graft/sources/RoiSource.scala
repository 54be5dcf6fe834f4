package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3 ADC/ROI binary source (SURVEY.md §2.1): the `.roi` file is a bare
  * concatenation of 8-bit grayscale images; the `.adc` CSV carries one row
  * per trigger with the byte offset and image geometry (reference: pyifcb
  * `DataDirectory` use at extract_slim_features.py:62,103; export logic
  * code/extract_all.R:13-19).
  *
  * Spark-first: the `.adc` is a plain CSV scan; the `.roi` bytes arrive
  * via `binaryFile`; slicing is a join on sample + a `substr` over the
  * binary column — one row per image, `BinaryType` pixels (“the
  * multimodal column of this pipeline”, SURVEY.md §1.1). Rows with
  * zero-area triggers (no image) are dropped as the reference does.
  *
  * Scale note: a bin file is ≲0.5 GB (the reference's own ingest guard)
  * and one bin = one task, so the whole-file binaryFile read matches the
  * reference's parallelism unit; images explode to rows immediately after
  * the slice, so downstream operators stream per-image without holding
  * whole bins.
  */
object RoiSource {

  /** ADC schema: trigger rows with image geometry + byte offset. */
  def readAdc(spark: SparkSession, path: String): DataFrame =
    readAdc(spark, Seq(path))

  /** Multi-path overload (round-12 review): incremental callers pass
    * the explicit .adc list of the bins under processing instead of
    * re-scanning the whole-archive glob every run.
    */
  def readAdc(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "RoiSource.readAdc: empty path list")
    spark.read
      .schema("roi_number INT, width INT, height INT, start_byte LONG")
      .option("header", "true")
      .csv(paths: _*)
      .withColumn("sample",
        regexp_extract(input_file_name(), HdrSource.SampleIdPattern, 1))
  }

  /** One row per image: (sample, roi_number, width, height, pixels).
    * Files whose names don't carry an IFCB sample id are dropped on
    * BOTH sides: a non-match extracts "" and two empty-sample sides
    * would cross-join unrelated bins, slicing pixels from the wrong
    * .roi payload.
    *
    * Fail-loudly contract (round-10 fuzz hardening, RoiFuzzSpec): an ADC
    * row whose offset/geometry runs past the `.roi` payload makes
    * `substring` silently return a SHORT byte array — pixels that decode
    * to a garbage image. With `strict = true` (default) such rows raise
    * instead; pass `strict = false` only from a flow that dead-letters
    * corrupt bins itself (the IngestQc gate pattern).
    */
  def images(adc: DataFrame, roiFiles: DataFrame,
      strict: Boolean = true): DataFrame = {
    val roi = roiFiles
      .withColumn("sample",
        regexp_extract(col("path"), HdrSource.SampleIdPattern, 1))
      .filter(col("sample") =!= "")
      .select(col("sample"), col("content"))
    // slice arguments are computed in 64-bit and CLAMPED into int range
    // so that a corrupted offset/geometry can neither wrap around 32 bits
    // (non-ANSI: cast(4294967280 as int) = -16 would slice from the
    // payload END with a plausible length) nor throw an engine-config-
    // dependent ANSI overflow error before the guard below runs
    val sliceExpr = expr(
      "substring(content, " +
        "cast(least(greatest(start_byte + 1, 1), 2147483647) as int), " +
        "cast(least(cast(width as bigint) * cast(height as bigint), " +
        "2147483647) as int))")
    val sliced = adc
      .filter(col("sample") =!= "")
      .filter(col("width") > 0 && col("height") > 0)
      .join(roi, "sample")
      .select(
        col("sample"), col("roi_number"), col("width"), col("height"),
        col("start_byte"),
        length(col("content")).cast("long").as("__payload_len"),
        sliceExpr.as("pixels"))
    val need = col("width").cast("long") * col("height").cast("long")
    val guarded =
      if (!strict) sliced
      // long-arithmetic validity: a negative offset slices from the
      // payload END (SQL substring semantics) and can return a
      // right-length wrong-content array; an extent past the payload
      // returns a short array — both rejected on the UNCLAMPED numbers.
      // The bound is phrased subtraction-side (need <= payload - start)
      // because start_byte + need can wrap negative in non-ANSI long
      // arithmetic when start_byte is near Long.MaxValue, which would
      // sneak a clamped garbage slice past an addition-side check;
      // payload_len <= 2^31 and both operands bounded, so neither
      // subtraction can itself overflow
      else sliced.withColumn("pixels",
        when(col("start_byte") >= 0 &&
            col("start_byte") <= col("__payload_len") &&
            need <= col("__payload_len") - col("start_byte"),
          col("pixels"))
          .otherwise(raise_error(concat(
            lit("truncated ROI slice: sample "), col("sample"),
            lit(" roi "), col("roi_number"),
            lit(" claims "), need.cast("string"),
            lit(" bytes at offset "), col("start_byte").cast("string"),
            lit(" past the payload")))))
    guarded.drop("start_byte", "__payload_len")
  }

  /** Convenience: read a directory of bin trios. A flow that excludes
    * some bins (dead-letter gates, blacklists) must filter BEFORE the
    * strict guard sees their rows — either pass `strict = false` here
    * and validate after its own join, or semi-join the ADC frame first
    * and call [[images]] directly (the [[graft.jobs.IngestQc]] pattern).
    */
  def read(spark: SparkSession, dir: String, strict: Boolean = true): DataFrame = {
    val adc = readAdc(spark, s"$dir/*.adc")
    val roi = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.roi").load(dir)
    images(adc, roi, strict)
  }
}
