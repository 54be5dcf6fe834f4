package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column functions — SURVEY.md §2.8 geo family.
  *
  * All are pure `Column` expression trees over built-in math functions, so
  * they stay inside whole-stage codegen (no UDF serialization boundary) and
  * Catalyst can push/reorder them freely.
  */
object Geo {

  val EarthRadiusKm = 6371.0088 // IUGG mean Earth radius

  /** Great-circle distance in km (haversine) — reference:
    * code/plot/compare_microscopy.R:61-64 (`distHaversine`, used in the
    * ≤5 km microscopy match J7) — as a codegen-able expression.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = pow(sin(dLat), 2.0) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2.0)
    lit(2.0 * EarthRadiusKm) * asin(least(lit(1.0), sqrt(a)))
  }

  /** Fixed-grid cell id — reference: code/plot/samples_frequency_map.R:36-43
    * (grid-cell `st_intersects` counting). A lat/lon floor-bin replaces the
    * geometric intersection entirely: groupBy(cell) is one hash shuffle, no
    * geometry library, no skew beyond the data's own spatial skew.
    */
  def gridCell(lat: Column, lon: Column, cellDeg: Double): (Column, Column) =
    (floor(lat / cellDeg), floor(lon / cellDeg))

  /** Near-polygon test: inside OR within `distanceM` meters of any edge
    * (reference: `ifcb_is_near_land` with a 500 m coastline buffer,
    * ifcb-data-pipeline.Rmd:722-726). Instead of buffering the polygon
    * (a geometry-library operation), the distance to each edge segment is
    * measured directly in a local equirectangular projection around the
    * query point — equivalent for QC-scale distances (≤ a few km), no
    * geometry dependency.
    */
  def nearPolygon(polygon: Seq[(Double, Double)], distanceM: Double): (Column, Column) => Column = {
    val poly = polygon.toArray
    val inside = pointInPolygonEval(poly) _
    val f = udf { (lat: Double, lon: Double) =>
      if (inside(lat, lon)) true
      else {
        val mPerDegLat = 111320.0
        val mPerDegLon = 111320.0 * math.cos(math.toRadians(lat))
        var best = Double.MaxValue
        var j = poly.length - 1
        var i = 0
        while (i < poly.length && best > distanceM) {
          val (y1, x1) = poly(j); val (y2, x2) = poly(i)
          // segment in local meters
          val ax = (x1 - lon) * mPerDegLon; val ay = (y1 - lat) * mPerDegLat
          val bx = (x2 - lon) * mPerDegLon; val by = (y2 - lat) * mPerDegLat
          val dx = bx - ax; val dy = by - ay
          val len2 = dx * dx + dy * dy
          val t = if (len2 == 0) 0.0
                  else math.max(0.0, math.min(1.0, -(ax * dx + ay * dy) / len2))
          val px = ax + t * dx; val py = ay + t * dy
          best = math.min(best, math.sqrt(px * px + py * py))
          j = i
          i += 1
        }
        best <= distanceM
      }
    }
    (lat: Column, lon: Column) => f(lat, lon)
  }

  // private[graft] so Maps.inRing delegates here instead of carrying a
  // third hand-rolled copy of the crossing test (round-12 review): a
  // boundary-semantics fix must change the basin flags AND the rendered
  // land mask together, never one without the other
  private[graft] def pointInPolygonEval(poly: Array[(Double, Double)])(lat: Double, lon: Double): Boolean = {
    var inside = false
    var j = poly.length - 1
    var i = 0
    while (i < poly.length) {
      val (yi, xi) = poly(i)
      val (yj, xj) = poly(j)
      if ((yi > lat) != (yj > lat) &&
        lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Point-in-polygon (ray casting) over a small broadcast polygon, as a
    * UDF — reference: `ifcb_is_in_basin` (ifcb-data-pipeline.Rmd:729-736).
    * Polygons are driver-side constants (basin shapes are KBs); the UDF is
    * the pragmatic v1 per SURVEY.md §7.3 — swap for a codegen Expression
    * only if profiling demands.
    */
  def pointInPolygon(polygon: Seq[(Double, Double)]): (Column, Column) => Column = {
    val poly = polygon.toArray
    // ONE copy of the crossing-test math (round-12): a boundary-semantics
    // fix applied to pointInPolygonEval must not leave this UDF behind,
    // or nearPolygon and pointInPolygon would disagree on edge points
    val f = udf(pointInPolygonEval(poly) _)
    (lat: Column, lon: Column) => f(lat, lon)
  }
}
