package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Geo, Strings}

/** Coordinate QC + flag combination (reference:
  * ifcb-data-pipeline.Rmd:715-765): sample positions are tested against
  * the coastline (near-land within 500 m) and basin polygons, the
  * near-land flag is united with the PSD quality flags, and samples are
  * grouped for the QC map.
  *
  * Polygons are driver-side constants (loaded via
  * [[graft.sources.ShapefileSource]]) broadcast into per-row UDFs — the
  * frame never shuffles; the one join is a broadcast-able full outer on
  * the sample key.
  */
object CoordinateQc {

  /** Position enrichment (Rmd:715-740): near_land, in_basin, basin name
    * by first-match over named basin polygons.
    *
    * @param positions (sample, lat, lon) — rows with null coordinates are
    *                  dropped, like the reference's filter
    * @param coast     coastline polygon rings (lat, lon)
    * @param basins    (name, polygon) list; `basin` = first containing
    */
  def checkCoordinates(
      positions: DataFrame,
      coast: Seq[(Double, Double)],
      basins: Seq[(String, Seq[(Double, Double)])],
      nearLandM: Double = 500.0): DataFrame = {
    val nearLand = Geo.nearPolygon(coast, nearLandM)
    val withNear = positions
      .filter(col("lat").isNotNull && col("lon").isNotNull)
      .withColumn("near_land", nearLand(col("lat"), col("lon")))
    basins.foldLeft(
      withNear
        .withColumn("in_basin", lit(false))
        .withColumn("basin", lit(null).cast("string"))) {
      case (df, (name, poly)) =>
        val test = Geo.pointInPolygon(poly)
        val in = test(col("lat"), col("lon"))
        df.withColumn("basin", when(col("basin").isNull && in, name).otherwise(col("basin")))
          .withColumn("in_basin", col("in_basin") || in)
    }
  }

  /** Flag combination (Rmd:757-765): PSD flags full-joined to checked
    * positions, "Near land" united in (comma separator, NA-skipping),
    * sentence case, empty → null, map group red/blue.
    */
  def qcFlags(psdFlags: DataFrame, checked: DataFrame): DataFrame = {
    val united = psdFlags
      .join(checked, Seq("sample"), "full_outer")
      .withColumn("near_land_qflag",
        when(col("near_land"), "Near land").otherwise(lit(null).cast("string")))
      // IngestQc.psd emits the 'ok' SENTINEL for unflagged samples
      // (flags7's .otherwise, kept for q88 oracle parity); treating it
      // as a real flag painted every healthy sample red with a bogus
      // 'Ok' label (round-14 review) — the reference uses NA for
      // unflagged (Rmd:757-765), so 'ok' maps to null here
      .withColumn("flag",
        when(lower(col("flag")) === "ok", lit(null).cast("string"))
          .otherwise(col("flag")))
      .withColumn("flag",
        concat_ws(", ",
          // concat_ws skips nulls — R's unite(na.rm = TRUE)
          col("flag"), col("near_land_qflag")))
      .withColumn("flag",
        when(col("flag") === "", lit(null).cast("string"))
          .otherwise(Strings.sentenceCase(col("flag"))))
    united
      .select(col("sample"), col("flag"), col("lat"), col("lon"))
      .withColumn("group", when(col("flag").isNull, "blue").otherwise("red"))
  }
}
