package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import graft.SparkSpec

/** ShapefileSource against generated spec-faithful fixtures: a two-record
  * polygon .shp (square + two-ring donut), dBASE attributes, WKB parsing,
  * and the broadcast point-in-polygon flag end to end.
  */
class ShapefileSourceSpec extends SparkSpec {
  import spark.implicits._

  private val square = Seq(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)))
  private val donut = Seq(
    Seq((20.0, 0.0), (30.0, 0.0), (30.0, 10.0), (20.0, 10.0), (20.0, 0.0)),
    Seq((23.0, 3.0), (27.0, 3.0), (27.0, 7.0), (23.0, 7.0), (23.0, 3.0)))

  test("readShp parses multi-record, multi-ring polygons") {
    val rings = ShapefileSource.readShp(ShapefileFixture.writeShp(Seq(square, donut)))
    assert(rings.map(r => (r.recordNo, r.partNo)) == Seq((1, 0), (2, 0), (2, 1)))
    assert(rings.head.points.head == ((0.0, 0.0)))
    assert(rings.last.points.size == 5)
  }

  test("readDbf + readPolygons join attributes by record order") {
    val shp = ShapefileFixture.writeShp(Seq(square, donut))
    val dbf = ShapefileFixture.writeDbf(Seq(("BASIN", 16)), Seq(Seq("Kattegat"), Seq("Skagerrak")))
    val polys = ShapefileSource.readPolygons(shp, Some(dbf))
    assert(polys.size == 2)
    assert(polys.head._1("BASIN") == "Kattegat" && polys.head._2.size == 1)
    assert(polys(1)._1("BASIN") == "Skagerrak" && polys(1)._2.size == 2)
  }

  test("readWkbPolygon handles both byte orders") {
    for (o <- Seq(ByteOrder.LITTLE_ENDIAN, ByteOrder.BIG_ENDIAN)) {
      val rings = ShapefileSource.readWkbPolygon(
        ShapefileFixture.writeWkb(square, o))
      assert(rings.size == 1 && rings.head.size == 5 && rings.head(1) == ((10.0, 0.0)))
    }
  }

  test("readWkbPolygon rejects EWKB Z/M/SRID variants instead of garbling points") {
    // round-12 review: `& 0xff` accepted a PolygonZ (0x80000003), whose
    // 24-byte points the 16-byte stride would silently garble
    val wkb = ShapefileFixture.writeWkb(square, ByteOrder.LITTLE_ENDIAN)
    val bb = ByteBuffer.wrap(wkb.clone()).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1, 0x80000003) // EWKB Z flag
    val e = intercept[IllegalArgumentException](
      ShapefileSource.readWkbPolygon(bb.array()))
    assert(e.getMessage.toLowerCase.contains("ewkb") ||
      e.getMessage.contains("80000003"), e.getMessage)
  }

  test("inPolygonFlag: broadcast ray-cast over shapefile geometry") {
    // shapefile x = lon, y = lat; square covers lon 0..10, lat 0..10
    val pts = Seq((5.0, 5.0), (5.0, 15.0), (-1.0, 5.0)).toDF("lat", "lon")
    val flagged = ShapefileSource.inPolygonFlag(pts, "lat", "lon", ShapefileFixture.writeShp(Seq(square)))
    val got = flagged.select("lat", "lon", "in_polygon")
      .as[(Double, Double, Boolean)].collect().toSet
    assert(got == Set((5.0, 5.0, true), (5.0, 15.0, false), (-1.0, 5.0, false)))
    // multi-part record (round-14 review: only part 0 was tested, so a
    // point inside an island HOLE flagged in-basin): even-odd over ALL
    // parts — inside the donut's hole = outside, in the annulus = inside
    val pts2 = Seq((1.0, 21.0), (5.0, 25.0), (5.0, 15.0)).toDF("lat", "lon")
    val flagged2 = ShapefileSource.inPolygonFlag(pts2, "lat", "lon",
      ShapefileFixture.writeShp(Seq(square, donut)), recordNo = 2)
    val got2 = flagged2.select("lat", "lon", "in_polygon")
      .as[(Double, Double, Boolean)].collect().toSet
    assert(got2 == Set((1.0, 21.0, true), (5.0, 25.0, false), (5.0, 15.0, false)))
  }
}
