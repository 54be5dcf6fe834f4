package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 SVEPA event-registry source (SURVEY.md §2.1): the reference fills
  * cruise numbers missing from the planned-cruises sheet by calling the
  * SVEPA event service per bin at pipeline runtime
  * (code/ifcb_ingest_and_qc.R:58-70 wraps `svepa_event.get_svepa_event
  * (platform, timestamp)`; the per-sample loop at R:223-246 and the
  * coalesce fill at R:249-253).
  *
  * Same snapshot-first rule as [[WormsSnapshot]] / [[DashboardSnapshot]]:
  * a scheduled 100 TB job never blocks on a per-row RPC loop — the
  * reference's R loop is one blocking HTTP call per unmatched bin on the
  * driver. Here the unmatched bins become a *request manifest* (one row
  * per lookup, written wherever egress exists), the fetched responses are
  * parsed back into a small keyed dim, and the fill is a broadcast join.
  */
object SvepaSnapshot {

  /** Request manifest for bins the cruise interval join left unmatched
    * (R:223-234): one row per lookup with the platform and the
    * `yyyyMMddHHmmss` timestamp rendering `format(..., "%Y%m%d%H%M%S")`
    * the service expects.
    *
    * @param missingCruise rows with `sample` and `datetime` where
    *                      `cruise_no` is null
    */
  def requests(missingCruise: DataFrame, platform: String = "SVEA"): DataFrame =
    missingCruise
      .select(
        col("sample"),
        lit(platform).as("platform"),
        date_format(col("datetime"), "yyyyMMddHHmmss").as("timestamp"))
      .distinct()

  /** Parses saved lookup responses — JSON documents/lines of the shape
    * the reference's safe wrapper produces (R:63-70:
    * `{"sample": ..., "id": <event id or null>, "error": <msg or null>}`)
    * — into the `(sample, svepa_cruise_no)` dim. Failed lookups (null
    * id) are kept as null so the downstream coalesce renders the
    * R-faithful "NA" label instead of dropping the bin. The dim is
    * deduplicated per sample (a retried lookup saved twice must not fan
    * bin rows out through the left join — the reference loop emits
    * exactly one row per missing pid), preferring a non-null id (`max`
    * ignores nulls) so a retry that eventually succeeded wins.
    */
  def parseResponses(spark: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "sample STRING, id STRING, error STRING")
    spark.read.schema(schema).json(dir)
      .select(col("sample"), col("id").as("svepa_cruise_no"))
      .groupBy(col("sample"))
      .agg(max(col("svepa_cruise_no")).as("svepa_cruise_no"))
  }

  /** The fill (R:249-253): left join the SVEPA dim by sample and
    * coalesce into `cruise_no`. The dim is per-unmatched-bin small —
    * always broadcast.
    */
  def resolveCruiseNo(binCruises: DataFrame, svepa: DataFrame): DataFrame =
    binCruises
      .join(broadcast(svepa.select(col("sample"), col("svepa_cruise_no"))),
        Seq("sample"), "left")
      .withColumn("cruise_no",
        coalesce(col("cruise_no").cast("string"), col("svepa_cruise_no")))
      .drop("svepa_cruise_no")

  /** Writes the parsed responses as the broadcastable snapshot parquet. */
  def writeSnapshot(spark: SparkSession, responsesDir: String, out: String): Unit =
    parseResponses(spark, responsesDir)
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
}
