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

  private def fmt(d: Double): String = Svg.fmt(d)

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
    // a sample without a position or date cannot be placed on a month
    // panel — filter AFTER the casts or one GPS-less row NPEs the
    // primitive getters and kills the whole render (round-11 review;
    // the reference's na.rm guards / comparisonMapsHtml's own filter)
    val rows = samples.select(
        col(sampleCol).cast("string").as("s"), col(latCol).cast("double").as("la"),
        col(lonCol).cast("double").as("lo"), year(col(dateCol)).as("y"),
        month(col(dateCol)).as("m"), col(flagCol).cast("string").as("fl"))
      .filter(col("s").isNotNull && col("la").isNotNull &&
        col("lo").isNotNull && col("y").isNotNull && col("m").isNotNull &&
        // NaN positions are as unplottable as nulls: they poison the
        // viewport min/max and every marker renders at literal "NaN"
        // (round-14 review)
        !isnan(col("la")) && !isnan(col("lo")))
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
    val cells = points
      // null/NaN positions have no cell — see qcMapHtml; the NaN gate
      // must run BEFORE the long cast (floor(NaN) aborts the render
      // under ANSI with CAST_OVERFLOW, and silently bins into a phantom
      // (0,0) cell otherwise — round-14 review)
      .filter(col(lonCol).isNotNull && col(latCol).isNotNull &&
        !isnan(col(lonCol).cast("double")) && !isnan(col(latCol).cast("double")))
      .select(
        floor(col(lonCol) / cellLon).cast("long").as("cx"),
        floor(col(latCol) / cellLat).cast("long").as("cy"))
      .filter(col("cx").isNotNull && col("cy").isNotNull)
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

  /** Interpolation grid + correlation length for [[distributionMapsHtml]]
    * — defaults are the reference's Baltic grid
    * (plot_diva_maps.R:68-72: 100×110 cells over lon 11.8–22,
    * lat 53.5–60; correlation length `len = 1`° at :117; the summer
    * cyano variant uses `len = .75`,
    * plot_diva_maps_summer_cyano.R:118).
    */
  final case class GridSpec(
      minLon: Double = 11.8, maxLon: Double = 22.0, nx: Int = 100,
      minLat: Double = 53.5, maxLat: Double = 60.0, ny: Int = 110,
      len: Double = 1.0) {
    def lons: IndexedSeq[Double] =
      (0 until nx).map(i => minLon + (maxLon - minLon) * i / (nx - 1))
    def lats: IndexedSeq[Double] =
      (0 until ny).map(j => minLat + (maxLat - minLat) * j / (ny - 1))
  }

  /** oce.colorsTemperature-like ramp (plot_diva_maps.R:216) — blue →
    * pale → red anchor interpolation; an approximation of the oce
    * palette (the exact anchors are not the contract, determinism is).
    */
  private[sources] def temperature(t: Double): String = {
    val anchors = Array((4, 36, 130), (108, 170, 214), (240, 235, 220),
      (222, 119, 66), (138, 13, 28))
    val x = math.max(0.0, math.min(1.0, t)) * (anchors.length - 1)
    val i = math.min(anchors.length - 2, x.toInt)
    val f = x - i
    def mix(a: Int, b: Int): Int = math.round(a + (b - a) * f).toInt
    f"#${mix(anchors(i)._1, anchors(i + 1)._1)}%02x" +
      f"${mix(anchors(i)._2, anchors(i + 1)._2)}%02x" +
      f"${mix(anchors(i)._3, anchors(i + 1)._3)}%02x"
  }

  /** The DIVA stand-in's numeric core (plot_diva_maps.R:117 `len`,
    * epsilon2 = 1): a Gaussian-kernel weighted mean — weight
    * `exp(-(dx² + dy²) / (2·len²))` from each grid node to each
    * station, field value = Σw·f / Σw; masked nodes are NaN, as is a
    * node all of whose weights underflow to zero. Pinned against a
    * hand-computed 2×2 fixture in ReportsSpec (round-10 verdict task 6)
    * so the kernel's exact shape — the 2·len² denominator, the
    * lat/lon axis orientation — cannot drift silently.
    *
    * @param pts (lat, lon, value) stations
    * @param sea (i, j) => grid node is water (masked nodes render blank)
    */
  private[sources] def gaussianField(pts: Seq[(Double, Double, Double)],
      lons: IndexedSeq[Double], lats: IndexedSeq[Double],
      len: Double, sea: (Int, Int) => Boolean): Array[Array[Double]] = {
    val twoLen2 = 2.0 * len * len
    Array.tabulate(lons.length, lats.length) { (i, j) =>
      if (!sea(i, j)) Double.NaN
      else {
        var sw = 0.0; var swf = 0.0
        pts.foreach { case (plat, plon, f) =>
          val dx = lons(i) - plon; val dy = lats(j) - plat
          val wgt = math.exp(-(dx * dx + dy * dy) / twoLen2)
          sw += wgt; swf += wgt * f
        }
        if (sw == 0.0) Double.NaN else swf / sw
      }
    }
  }

  /** Point-in-ring ray casting over (lon, lat) ring points (the land
    * mask of plot_diva_maps.R:86-92, minus the geometry library).
    * Delegates to [[graft.functions.Geo.pointInPolygonEval]] — the ONE
    * copy of the crossing-test math (round-12 review): a
    * boundary-semantics fix there must move the basin flags and this
    * land mask together. Ring points are (lon, lat); the evaluator
    * takes (lat, lon) tuples, so callers pre-swap ONCE per ring (the
    * sea mask probes every grid node against every ring).
    */
  private def swapAxes(ring: ShapefileSource.Ring): Array[(Double, Double)] =
    ring.points.map { case (x, y) => (y, x) }.toArray

  private def inRing(latLonRing: Array[(Double, Double)],
      lon: Double, lat: Double): Boolean =
    graft.functions.Geo.pointInPolygonEval(latLonRing)(lat, lon)

  /** DIVA-style per-taxon distribution maps (plot_diva_maps.R:38-277,
    * the reference's most-shared scientific product; summer cyano
    * variant plot_diva_maps_summer_cyano.R): per (cruise, taxon) the
    * reference interpolates station carbon concentrations onto a fixed
    * Baltic grid (DIVAnd optimal interpolation, correlation length
    * `len`, epsilon2 = 1), masks land polygons plus the Kattegat
    * exclusion corner (`lat > 55.6 & lon < 13`, :95), and renders one
    * faceted raster per cruise — per-taxon panels, sampling stations as
    * translucent white points, land drawn on top, a single GLOBAL color
    * limit across every cruise and taxon (:166-171) so panels are
    * visually comparable.
    *
    * Engine re-expression: the container has no Julia, and the output
    * contract here is byte-deterministic SVG a golden test can pin — so
    * a Gaussian-kernel weighted mean (weights `exp(-d²/2·len²)`, the
    * covariance kernel DIVAnd's variational solve approximates, same
    * correlation-length parameter) stands in for DIVAndrun. Scale
    * discipline: the data-grain half — rolling a 100 TB observation
    * table up to one row per (cruise, taxon, station) and the distinct
    * (cruise, month) set — runs DISTRIBUTED; only those small frames
    * are collected, and the fixed NX×NY grid (data-independent size) is
    * evaluated on the driver, exactly like the reference's per-cruise
    * loop but with the data already reduced.
    *
    * @param obs       observation-grain frame (any grain at or below
    *                  station: it is aggregated here)
    * @param exclude   extra mask predicate on (lon, lat) — default is
    *                  the reference's Kattegat corner
    */
  def distributionMapsHtml(obs: DataFrame, cruiseCol: String,
      taxonCol: String, latCol: String, lonCol: String, valueCol: String,
      dateCol: String, grid: GridSpec = GridSpec(),
      basins: Seq[ShapefileSource.Ring] = Nil,
      exclude: (Double, Double) => Boolean = (lon, lat) => lat > 55.6 && lon < 13.0,
      w: Int = 320, h: Int = 340, titlePrefix: String = "Biomass"): String = {
    // distributed rollup: station grain per (cruise, taxon) + month set
    val stations = obs.groupBy(
        col(cruiseCol).cast("string").as("cruise"),
        col(taxonCol).cast("string").as("taxon"),
        col(latCol).cast("double").as("lat"),
        col(lonCol).cast("double").as("lon"))
      .agg(avg(col(valueCol).cast("double")).as("f"))
      // a station without keys/position/value cannot be drawn — see qcMapHtml
      .filter(col("cruise").isNotNull && col("taxon").isNotNull &&
        col("lat").isNotNull && col("lon").isNotNull && col("f").isNotNull)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(r => (r._1, r._2, r._3, r._4))
    val months = obs.select(col(cruiseCol).cast("string").as("cruise"),
        month(col(dateCol)).as("mo")).distinct()
      .filter(col("cruise").isNotNull && col("mo").isNotNull)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).map { case (c, ms) => c -> ms.map(_._2).distinct.sorted.toSeq }
    if (stations.isEmpty) return "<div class=\"distribution-maps\"></div>\n"

    val lons = grid.lons
    val lats = grid.lats
    // sea mask: not on land, not in the excluded corner (computed once;
    // identical for every cruise and taxon)
    val basinRings = basins.map(swapAxes)
    val sea = Array.tabulate(grid.nx, grid.ny) { (i, j) =>
      !exclude(lons(i), lats(j)) && !basinRings.exists(b => inRing(b, lons(i), lats(j)))
    }

    val fields = stations.groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1)
      .map { case ((cruise, taxon), rs) =>
        (cruise, taxon, gaussianField(rs.toSeq.map(r => (r._3, r._4, r._5)),
          lons, lats, grid.len, (i, j) => sea(i)(j)))
      }
    // global color limits across ALL cruises and taxa (:166-171)
    val values = fields.flatMap(_._3.iterator.flatMap(_.iterator)).filterNot(_.isNaN)
    if (values.isEmpty) return "<div class=\"distribution-maps\"></div>\n" // fully-masked grid
    val (zMin, zMax) = (values.min, values.max)
    def tOf(v: Double): Double =
      if (zMax == zMin) 0.5 else (v - zMin) / (zMax - zMin)

    val vp = viewport(Seq(grid.minLon, grid.maxLon), Seq(grid.minLat, grid.maxLat), w, h)
    val cellW = vp.x(lons(math.min(1, grid.nx - 1))) - vp.x(lons(0))
    val cellH = vp.y(lats(0)) - vp.y(lats(math.min(1, grid.ny - 1)))
    val sb = new StringBuilder
    sb ++= "<div class=\"distribution-maps\">\n"
    fields.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (cruise, taxa) =>
      val mos = months.getOrElse(cruise, Seq.empty[Int])
        .map(m => MonthNames(m - 1)).mkString(",")
      sb ++= s"<h3>${escape(s"$titlePrefix, cruise: $cruise, month(s): $mos")}</h3>\n"
      sb ++= "<div class=\"facets\">\n"
      taxa.sortBy(_._2).foreach { case (_, taxon, fi) =>
        sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">\n"""
        sb ++= s"  <title>${escape(taxon)}</title>\n"
        for (i <- 0 until grid.nx; j <- 0 until grid.ny if !fi(i)(j).isNaN) {
          val x0 = vp.x(lons(i)) - cellW / 2
          val y0 = vp.y(lats(j)) - cellH / 2
          sb ++= s"""  <rect x="${fmt(x0)}" y="${fmt(y0)}" width="${fmt(cellW)}" height="${fmt(cellH)}" fill="${temperature(tOf(fi(i)(j)))}"/>\n"""
        }
        // sampling stations: white translucent markers (:224-225)
        stations.filter(_._1 == cruise).map(r => (r._3, r._4)).distinct
          .foreach { case (plat, plon) =>
            sb ++= s"""  <circle cx="${fmt(vp.x(plon))}" cy="${fmt(vp.y(plat))}" r="3" fill="white" fill-opacity="0.5"/>\n"""
          }
        sb ++= basinPaths(vp, basins) // land on top (:226-227 draws sf last)
        sb ++= s"""  <text x="${w / 2}" y="14" text-anchor="middle" font-size="12">${escape(taxon)}</text>\n"""
        sb ++= "</svg>\n"
      }
      sb ++= "</div>\n"
    }
    sb ++= "</div>\n"
    sb.toString
  }

  /** Summer cyanobacteria variant (plot_diva_maps_summer_cyano.R):
    * the same render restricted to June–August observations of the
    * selected taxa, with the variant's shorter correlation length
    * (`len = .75`, :118) and its title prefix (:250).
    */
  def summerCyanoMapsHtml(obs: DataFrame, cruiseCol: String,
      taxonCol: String, latCol: String, lonCol: String, valueCol: String,
      dateCol: String,
      taxa: Seq[String] = Seq("Nodularia spumigena", "Aphanizomenon", "Dolichospermum"),
      grid: GridSpec = GridSpec(len = 0.75),
      basins: Seq[ShapefileSource.Ring] = Nil,
      w: Int = 320, h: Int = 340): String =
    distributionMapsHtml(
      obs.filter(col(taxonCol).isin(taxa: _*) &&
        month(col(dateCol)).between(6, 8)),
      cruiseCol, taxonCol, latCol, lonCol, valueCol, dateCol,
      grid, basins, w = w, h = h,
      titlePrefix = "Cyanobacterial biomass")

  /** Sampling-points overview map (plots-poster.R:88-125): the distinct
    * sample positions as red markers over the basemap, limits = data
    * range padded 1° (`basemap(limits = c(min - 1, max + 1, …))`),
    * land `#eeeac4` with black borders, light-blue sea panel. The
    * distinct() runs DISTRIBUTED (the reference's
    * `select(LATIT, LONGI) %>% distinct()`) so only one row per
    * position reaches the driver.
    */
  def pointsMapSvg(points: DataFrame, latCol: String, lonCol: String,
      basins: Seq[ShapefileSource.Ring] = Nil,
      w: Int = 800, h: Int = 600): String = {
    val pts = points.select(col(latCol).cast("double"),
        col(lonCol).cast("double"))
      .filter(col(latCol).isNotNull && col(lonCol).isNotNull)
      .distinct()
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
      .sortBy(identity)
    if (pts.isEmpty)
      return s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h"></svg>\n"""
    val vp = viewport(pts.map(_._2).toIndexedSeq, pts.map(_._1).toIndexedSeq, w, h)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">\n"""
    sb ++= s"""  <rect x="0" y="0" width="$w" height="$h" fill="lightblue"/>\n"""
    sb ++= basinPaths(vp, basins)
    pts.foreach { case (lat, lon) =>
      sb ++= s"""  <circle cx="${fmt(vp.x(lon))}" cy="${fmt(vp.y(lat))}" r="3" fill="#d62728" fill-opacity="0.7"/>\n"""
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Microscopy-vs-IFCB faceted bubble maps
    * (compare_microscopy.R:196-268): a nested facet grid — taxon rows ×
    * (month, sample type) columns — where each panel draws the paired
    * stations as bubbles sized by carbon concentration
    * (`scale_size_continuous(range = c(6, 20))`, scaled over the GLOBAL
    * value range so panels compare), filled by sample type
    * (IFCB `#1f77b4`, Microscopy `#ff7f0e`, :228-231) and stroked by
    * sample depth (integrated `#2ca02c`, surface `#d62728`, :234-237),
    * alpha 0.7, over one shared basemap extent (data range ± 1°).
    *
    * Input is the plot-grain frame the reference pivots to
    * (`joined_data_long`): one row per
    * (taxon, month, sample type, depth, lat, lon, value); rows with a
    * null value are dropped like the reference's
    * `filter(!is.na(carbon_concentration))`.
    */
  def comparisonMapsHtml(pairs: DataFrame, taxonCol: String,
      monthCol: String, typeCol: String, depthCol: String,
      latCol: String, lonCol: String, valueCol: String,
      basins: Seq[ShapefileSource.Ring] = Nil,
      w: Int = 260, h: Int = 240): String = {
    val TypeFill = Map("IFCB" -> "#1f77b4", "Microscopy" -> "#ff7f0e")
    val DepthStroke: String => String =
      d => if (d == "Surface") "#d62728" else "#2ca02c"
    val rows = pairs.select(col(taxonCol).cast("string"),
        col(monthCol).cast("int"), col(typeCol).cast("string"),
        col(depthCol).cast("string"), col(latCol).cast("double"),
        col(lonCol).cast("double"), col(valueCol).cast("double"))
      // na.rm like the reference's !is.na(carbon_concentration), plus
      // position/month — a panel cannot place a point without them —
      // plus the PANEL KEYS: a null taxon/type/depth string NPEs the
      // driver-side sortBy/escape and kills the whole report render
      // (round-12 review; the round-11 null-discipline class, applied
      // to this renderer too)
      .filter(col(valueCol).isNotNull && col(latCol).isNotNull &&
        col(lonCol).isNotNull && col(monthCol).between(1, 12) &&
        col(taxonCol).isNotNull && col(typeCol).isNotNull &&
        col(depthCol).isNotNull)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      // FULL tuple: same-station rows differing only in depth/value must
      // order deterministically or the golden byte contract breaks
      .sortBy(r => (r._1, r._2, r._3, r._5, r._6, r._4, r._7))
    if (rows.isEmpty) return "<div class=\"comparison-maps\"></div>\n"
    val vp = viewport(rows.map(_._6).toIndexedSeq, rows.map(_._5).toIndexedSeq, w, h)
    val (vMin, vMax) = (rows.map(_._7).min, rows.map(_._7).max)
    def radius(v: Double): Double = // size range c(6, 20), global scale
      if (vMax == vMin) 13.0 else 6.0 + (v - vMin) / (vMax - vMin) * 14.0
    val taxa = rows.map(_._1).distinct.sorted
    val cols = rows.map(r => (r._2, r._3)).distinct.sorted
    val sb = new StringBuilder
    sb ++= "<div class=\"comparison-maps\">\n"
    taxa.foreach { taxon =>
      sb ++= s"<h3><i>${escape(taxon)}</i></h3>\n<div class=\"facets\">\n"
      cols.foreach { case (mo, typ) =>
        val panel = rows.filter(r => r._1 == taxon && r._2 == mo && r._3 == typ)
        sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" viewBox="0 0 $w $h">\n"""
        sb ++= s"""  <rect x="0" y="0" width="$w" height="$h" fill="lightblue"/>\n"""
        sb ++= basinPaths(vp, basins)
        panel.foreach { case (_, _, _, depth, lat, lon, v) =>
          sb ++= s"""  <circle cx="${fmt(vp.x(lon))}" cy="${fmt(vp.y(lat))}" r="${fmt(radius(v))}" fill="${TypeFill.getOrElse(typ, "#888888")}" fill-opacity="0.7" stroke="${DepthStroke(depth)}" stroke-width="1.5"><title>${fmt(v)}</title></circle>\n"""
        }
        sb ++= s"""  <text x="${w / 2}" y="14" text-anchor="middle" font-weight="bold" font-size="11">${escape(s"${MonthNames(mo - 1)} · $typ")}</text>\n"""
        sb ++= "</svg>\n"
      }
      sb ++= "</div>\n"
    }
    sb ++= "</div>\n"
    sb.toString
  }

  private def escape(s: String): String = Svg.escape(s)
}
