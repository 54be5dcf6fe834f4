package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S8/S9 REST-source snapshot tooling (SURVEY.md §2.1): the reference
  * calls the WoRMS REST API per taxa batch at pipeline runtime
  * (ifcb-data-pipeline.Rmd:973-1011 `match_worms_taxa` with retries).
  * The engine's design rule is snapshot-first: a 100 TB job must never
  * block on per-row RPC, so the lookup becomes (1) build request URLs →
  * (2) fetch OFFLINE with any HTTP client → (3) parse responses into a
  * broadcast dim parquet. This module is the tooling for (1) and (3);
  * (2) is one curl loop run by the user wherever egress exists.
  */
object WormsSnapshot {

  /** Public WoRMS REST endpoint for fuzzy name matching. */
  val MatchEndpoint = "https://www.marinespecies.org/rest/AphiaRecordsByMatchNames"

  /** Batched match-request URLs for a taxa-name list (the reference
    * batches its `match_worms_taxa` calls the same way). Deterministic
    * order; names URL-encoded.
    */
  def requestUrls(names: Seq[String], batchSize: Int = 50): Seq[String] =
    names.distinct.sorted.grouped(batchSize).map { batch =>
      val qs = batch.map(n =>
        "scientificnames[]=" + java.net.URLEncoder.encode(n, "UTF-8"))
      s"$MatchEndpoint?${qs.mkString("&")}&marine_only=false"
    }.toSeq

  /** Response record schema (the AphiaRecord subset the reference keeps,
    * Rmd:981-993).
    */
  val recordSchema: StructType = StructType(Seq(
    StructField("AphiaID", LongType),
    StructField("scientificname", StringType),
    StructField("status", StringType),
    StructField("rank", StringType),
    StructField("kingdom", StringType),
    StructField("phylum", StringType),
    StructField("class", StringType),
    StructField("order", StringType),
    StructField("family", StringType),
    StructField("genus", StringType)))

  /** Parses saved `AphiaRecordsByMatchNames` responses (JSON files, one
    * array-of-arrays per request — outer array = queried names, inner =
    * candidate records) into the worms_* dim the reference joins on
    * (Rmd:984-1011). First candidate per name wins, like the reference's
    * `bind_rows` + AphiaID join.
    */
  def parseResponses(spark: SparkSession, dir: String): DataFrame = {
    // wholetext + from_json: each response file is one JSON document
    // (array of arrays), which line-oriented spark.read.json cannot hold
    val txt = spark.read.option("wholetext", true).text(dir)
    val parsed = txt.select(
      from_json(col("value"), ArrayType(ArrayType(recordSchema))).as("batches"))
    parsed
      .select(explode(col("batches")).as("candidates"))
      .filter(size(col("candidates")) > 0)
      .select(element_at(col("candidates"), 1).as("r"))
      .select(
        col("r.AphiaID").as("aphia_id"),
        col("r.scientificname").as("scientificname"),
        col("r.status").as("status"),
        col("r.rank").as("rank"),
        col("r.kingdom").as("worms_kingdom"),
        col("r.phylum").as("worms_phylum"),
        col("r.class").as("worms_class"),
        col("r.order").as("worms_order"),
        col("r.family").as("worms_family"),
        col("r.genus").as("worms_genus"))
      .dropDuplicates("aphia_id")
  }

  /** Writes the parsed dim as the broadcastable snapshot parquet. */
  def writeSnapshot(spark: SparkSession, responsesDir: String, out: String): Unit =
    parseResponses(spark, responsesDir)
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
}
