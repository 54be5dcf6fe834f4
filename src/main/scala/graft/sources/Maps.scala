package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Presentation-layer map outputs (SURVEY.md §2.1 K5 tail — reference:
  * the leaflet QC maps at ifcb-data-pipeline.Rmd:786-837, the gridded
  * sampling-frequency map at code/plot/samples_frequency_map.R:36-63,
  * and the per-basin distribution maps of code/plot/plot_diva_maps.R).
  *
  * The reference renders interactively (leaflet tiles, ggOceanMaps
  * basemaps); this engine renders self-contained SVG — no tile servers,
  * no rendering deps, byte-deterministic output a golden test can pin.
  * The split mirrors the report sinks' scale discipline: everything at
  * data grain (per-point flags, grid-cell counting) aggregates
  * DISTRIBUTED first; only the small summary (one row per sample or per
  * grid cell) is collected and walked on the driver.
  */
object Maps {

  /** Leaflet marker palette (Rmd:795-803: blue = unflagged, red =
    * flagged) and the reference basemap land fill
    * (samples_frequency_map.R:47 `land.col = "#eeeac4"`).
    */
  private val BlueMarker = "#2a81cb"
  private val RedMarker = "#cb2b3e"
  private val LandFill = "#eeeac4"

  private val MonthNames = Array("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")

  /** Linear lon/lat → SVG viewport projection over padded data limits
    * (the reference pads its basemap limits by 1°,
    * samples_frequency_map.R:45). Degenerate extents (a single sample)
    * stay finite because the pad guarantees a nonzero span.
    */
  private final case class Viewport(
      minLon: Double, maxLon: Double, minLat: Double, maxLat: Double,
      w: Int, h: Int) {
    def x(lon: Double): Double = (lon - minLon) / (maxLon - minLon) * w
    def y(lat: Double): Double = (maxLat - lat) / (maxLat - minLat) * h
  }

  private def viewport(lons: Seq[Double], lats: Seq[Double],
      w: Int, h: Int, pad: Double = 1.0): Viewport =
    Viewport(lons.min - pad, lons.max + pad, lats.min - pad, lats.max + pad, w, h)

  private def fmt(d: Double): String = f"$d%.2f"

  private def basinPaths(vp: Viewport, basins: Seq[ShapefileSource.Ring]): String =
    basins.map { r =>
      val d = r.points.map { case (lon, lat) =>
        s"${fmt(vp.x(lon))},${fmt(vp.y(lat))}"
      }.mkString(" ")
      s"""  <polygon points="$d" fill="$LandFill" stroke="black" stroke-width="0.5"/>"""
    }.mkString("", "\n", if (basins.isEmpty) "" else "\n")

  /** QC sample maps (Rmd:786-837): one SVG map per (year, month) with a
    * color-coded marker per sample — blue unflagged, red flagged — and
    * the reference's popup text (`Sample: …` / `Sample: … QFlag: …`) as
    * a `<title>` tooltip. Months without samples are skipped, exactly
    * like the reference's `nrow(gps_month) > 0` guard.
    *
    * The input is the sample-grain QC frame (one row per sample:
    * position, date, nullable flag string); distinct months and rows
    * are computed in Spark and only sample-grain rows are collected.
    *
    * @param basins optional land polygons drawn beneath the markers
    */
  def qcMapHtml(samples: DataFrame, sampleCol: String, latCol: String,
      lonCol: String, dateCol: String, flagCol: String,
      basins: Seq[ShapefileSource.Ring] = Nil,
      w: Int = 800, h: Int = 600): String = {
    val rows = samples.select(
        col(sampleCol).cast("string"), col(latCol).cast("double"),
        col(lonCol).cast("double"), year(col(dateCol)), month(col(dateCol)),
        col(flagCol).cast("string"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getInt(3), r.getInt(4), if (r.isNullAt(5)) None else Some(r.getString(5))))
      .sortBy { case (s, _, _, y, m, _) => (y, m, s) }
    if (rows.isEmpty) return "<div class=\"qc-maps\"></div>\n"
    val vp = viewport(rows.map(_._3).toIndexedSeq, rows.map(_._2).toIndexedSeq, w, h)
    val sb = new StringBuilder
    sb ++= "<div class=\"qc-maps\">\n"
    rows.groupBy(r => (r._4, r._5)).toSeq.sortBy(_._1).foreach {
      case ((yr, mo), monthRows) =>
        sb ++= s"<h3>${MonthNames(mo - 1)} $yr</h3>\n"
        sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">\n"""
        sb ++= basinPaths(vp, basins)
        monthRows.foreach { case (sample, lat, lon, _, _, flag) =>
          val color = if (flag.isDefined) RedMarker else BlueMarker
          val popup = flag match {
            case Some(f) => s"Sample: $sample QFlag: $f"
            case None => s"Sample: $sample"
          }
          sb ++= s"""  <circle cx="${fmt(vp.x(lon))}" cy="${fmt(vp.y(lat))}" r="4" fill="$color"><title>${escape(popup)}</title></circle>\n"""
        }
        sb ++= "</svg>\n"
    }
    sb ++= "</div>\n"
    sb.toString
  }

  /** Plasma-like color ramp for the frequency fill
    * (samples_frequency_map.R:53 `scale_fill_viridis_c(option =
    * "plasma")`): linear RGB interpolation across the plasma anchor
    * colors, `t` in [0, 1].
    */
  private[sources] def plasma(t: Double): String = {
    val anchors = Array((13, 8, 135), (204, 71, 120), (240, 249, 33))
    val x = math.max(0.0, math.min(1.0, t)) * (anchors.length - 1)
    val i = math.min(anchors.length - 2, x.toInt)
    val f = x - i
    def mix(a: Int, b: Int): Int = math.round(a + (b - a) * f).toInt
    val (r, g, b) =
      (mix(anchors(i)._1, anchors(i + 1)._1),
        mix(anchors(i)._2, anchors(i + 1)._2),
        mix(anchors(i)._3, anchors(i + 1)._3))
    f"#$r%02x$g%02x$b%02x"
  }

  /** Gridded sampling-frequency map (samples_frequency_map.R:36-63): the
    * distinct sample positions are binned into `cellLon × cellLat`
    * degree cells — the same floor-division grid keying as q26, computed
    * DISTRIBUTED (a 100 TB event table collapses to one row per
    * occupied cell before anything reaches the driver) — and rendered as
    * plasma-filled cell rectangles over the optional basin land
    * polygons, each cell carrying its frequency as a `<title>` tooltip.
    *
    * @param points position-grain frame; duplicates at identical
    *               (sample) grain should be `distinct`-ed by the caller
    *               like the reference's `distinct()` does
    */
  def frequencyMapSvg(points: DataFrame, latCol: String, lonCol: String,
      cellLon: Double = 0.3, cellLat: Double = 0.25,
      basins: Seq[ShapefileSource.Ring] = Nil,
      w: Int = 800, h: Int = 600): String = {
    val cells = points.select(
        floor(col(lonCol) / cellLon).cast("long").as("cx"),
        floor(col(latCol) / cellLat).cast("long").as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("frequency"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(c => (c._1, c._2))
    if (cells.isEmpty)
      return s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h"></svg>\n"""
    val lons = cells.flatMap(c => Seq(c._1 * cellLon, (c._1 + 1) * cellLon))
    val lats = cells.flatMap(c => Seq(c._2 * cellLat, (c._2 + 1) * cellLat))
    val vp = viewport(lons.toIndexedSeq, lats.toIndexedSeq, w, h)
    // ggplot's continuous scale normalizes over the DATA range (min→0,
    // max→1; a single level sits mid-ramp), not [0, max]
    val maxF = cells.map(_._3).max.toDouble
    val minF = cells.map(_._3).min.toDouble
    def t(f: Long): Double =
      if (maxF == minF) 0.5 else (f - minF) / (maxF - minF)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">\n"""
    sb ++= basinPaths(vp, basins)
    cells.foreach { case (cx, cy, f) =>
      val x0 = vp.x(cx * cellLon)
      val y0 = vp.y((cy + 1) * cellLat) // top edge = higher latitude
      val cw = vp.x((cx + 1) * cellLon) - x0
      val ch = vp.y(cy * cellLat) - y0
      sb ++= s"""  <rect x="${fmt(x0)}" y="${fmt(y0)}" width="${fmt(cw)}" height="${fmt(ch)}" fill="${plasma(t(f))}"><title>$f</title></rect>\n"""
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
