package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 dashboard-REST source (SURVEY.md §2.1): the reference downloads
  * sample metadata and bin listings from the IFCB Dashboard HTTP API at
  * pipeline runtime (code/helpers.R:21-107 `ifcb_get_dashboard_metadata`
  * — GET `<base>/api/export_metadata/<dataset>` as CSV — and
  * `ifcb_list_dashboard_bins` — GET `<base>/api/list_bins` as JSON;
  * consumed in the ingest job at code/ifcb_ingest_and_qc.R:413).
  *
  * Same snapshot-first rule as [[WormsSnapshot]]: a 100 TB job never
  * blocks on runtime RPC. This module builds the request URLs
  * (deterministic, encodable anywhere) and parses saved response files
  * into DataFrames; the fetch itself is one `curl` wherever egress
  * exists.
  */
object DashboardSnapshot {

  /** GET URL for the metadata CSV export (helpers.R:22-31): trailing
    * slashes trimmed, dataset slug URL-encoded when present.
    */
  def metadataUrl(baseUrl: String, dataset: Option[String] = None): String = {
    val base = baseUrl.replaceAll("/+$", "")
    // the slug is a PATH segment: URLEncoder alone is
    // application/x-www-form-urlencoded and emits '+' for spaces, which
    // a server decodes literally in a path (WormsSnapshot's query-string
    // use is where '+' is correct) — percent-encode instead
    val suffix = dataset.filter(_.nonEmpty)
      .map(d => java.net.URLEncoder.encode(d, "UTF-8").replace("+", "%20"))
      .getOrElse("")
    s"$base/api/export_metadata/$suffix"
  }

  /** GET URL for the bin list JSON (helpers.R:74-79). */
  def binListUrl(baseUrl: String): String =
    s"${baseUrl.replaceAll("/+$", "")}/api/list_bins"

  /** Parses a directory of saved `export_metadata` CSV responses into
    * the dashboard-metadata frame the ingest job joins against (pid +
    * comment_summary are the columns ifcb_ingest_and_qc.R:416-418
    * reads; the rest pass through as strings like R's `read.csv`).
    */
  def parseMetadata(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(dir)

  /** Parses saved `list_bins` JSON responses — each file one JSON
    * document `{"bins": [{"pid": ..., ...}]}` (or a bare array) — into
    * one row per bin.
    */
  def parseBinList(spark: SparkSession, dir: String): DataFrame = {
    val txt = spark.read.option("wholetext", true).text(dir)
    val wrappedType = org.apache.spark.sql.types.DataType.fromDDL(
      "STRUCT<bins: ARRAY<MAP<STRING, STRING>>>")
    val bareType = org.apache.spark.sql.types.DataType.fromDDL(
      "ARRAY<MAP<STRING, STRING>>")
    val wrapped = txt.select(
      // accept both the wrapped object and a bare top-level array
      coalesce(
        from_json(col("value"), wrappedType).getField("bins"),
        from_json(col("value"), bareType)).as("bins"))
    wrapped
      .select(explode(col("bins")).as("bin"))
      .select(
        element_at(col("bin"), "pid").as("pid"),
        element_at(col("bin"), "sample_time").as("sample_time"),
        element_at(col("bin"), "instrument").as("instrument"))
  }

  /** Writes parsed metadata as the broadcastable snapshot parquet. */
  def writeSnapshot(spark: SparkSession, responsesDir: String, out: String): Unit =
    parseMetadata(spark, responsesDir)
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
}
