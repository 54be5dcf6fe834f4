package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import graft.SparkSpec

/** ShapefileSource against generated spec-faithful fixtures: a two-record
  * polygon .shp (square + two-ring donut), dBASE attributes, WKB parsing,
  * and the broadcast point-in-polygon flag end to end.
  */
class ShapefileSourceSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal .shp writer (ESRI spec): polygon records only. */
  private def writeShp(records: Seq[Seq[Seq[(Double, Double)]]]): Array[Byte] = {
    val recs = records.zipWithIndex.map { case (rings, i) =>
      val numPoints = rings.map(_.size).sum
      val contentLen = 4 + 32 + 8 + 4 * rings.size + 16 * numPoints
      val b = ByteBuffer.allocate(8 + contentLen)
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(i + 1)              // record number (1-based)
      b.putInt(contentLen / 2)     // content length in 16-bit words
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(5)                  // polygon
      val xs = rings.flatten.map(_._1); val ys = rings.flatten.map(_._2)
      b.putDouble(xs.min).putDouble(ys.min).putDouble(xs.max).putDouble(ys.max)
      b.putInt(rings.size).putInt(numPoints)
      rings.scanLeft(0)(_ + _.size).init.foreach(b.putInt)
      rings.flatten.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
      b.array()
    }
    val total = 100 + recs.map(_.length).sum
    val out = ByteBuffer.allocate(total)
    out.order(ByteOrder.BIG_ENDIAN)
    out.putInt(9994)
    out.position(24)
    out.putInt(total / 2)
    out.order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(28, 1000)           // version
    out.putInt(32, 5)              // shape type polygon
    out.position(100)
    recs.foreach(out.put)
    out.array()
  }

  /** Minimal dBASE III writer: character fields only. */
  private def writeDbf(fields: Seq[(String, Int)], rows: Seq[Seq[String]]): Array[Byte] = {
    val headerLen = 32 + 32 * fields.size + 1
    val recordLen = 1 + fields.map(_._2).sum
    val out = ByteBuffer.allocate(headerLen + recordLen * rows.size + 1)
    out.order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x03.toByte)
    out.position(4); out.putInt(rows.size)
    out.putShort(headerLen.toShort); out.putShort(recordLen.toShort)
    out.position(32)
    for ((name, len) <- fields) {
      val pos = out.position()
      out.put(name.getBytes("US-ASCII").take(11))
      out.position(pos + 11)
      out.put('C'.toByte)
      out.position(pos + 16)
      out.put(len.toByte)
      out.position(pos + 32)
    }
    out.put(0x0d.toByte)
    for (r <- rows) {
      out.put(' '.toByte) // not deleted
      for ((v, (_, len)) <- r.zip(fields))
        out.put(v.padTo(len, ' ').take(len).getBytes("US-ASCII"))
    }
    out.array()
  }

  private val square = Seq(Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)))
  private val donut = Seq(
    Seq((20.0, 0.0), (30.0, 0.0), (30.0, 10.0), (20.0, 10.0), (20.0, 0.0)),
    Seq((23.0, 3.0), (27.0, 3.0), (27.0, 7.0), (23.0, 7.0), (23.0, 3.0)))

  test("readShp parses multi-record, multi-ring polygons") {
    val rings = ShapefileSource.readShp(writeShp(Seq(square, donut)))
    assert(rings.map(r => (r.recordNo, r.partNo)) == Seq((1, 0), (2, 0), (2, 1)))
    assert(rings.head.points.head == ((0.0, 0.0)))
    assert(rings.last.points.size == 5)
  }

  test("readDbf + readPolygons join attributes by record order") {
    val shp = writeShp(Seq(square, donut))
    val dbf = writeDbf(Seq(("BASIN", 16)), Seq(Seq("Kattegat"), Seq("Skagerrak")))
    val polys = ShapefileSource.readPolygons(shp, Some(dbf))
    assert(polys.size == 2)
    assert(polys.head._1("BASIN") == "Kattegat" && polys.head._2.size == 1)
    assert(polys(1)._1("BASIN") == "Skagerrak" && polys(1)._2.size == 2)
  }

  test("readWkbPolygon handles both byte orders") {
    def wkb(order: ByteOrder): Array[Byte] = {
      val ring = square.head
      val b = ByteBuffer.allocate(9 + 4 + 16 * ring.size).order(order)
      b.put(if (order == ByteOrder.LITTLE_ENDIAN) 1.toByte else 0.toByte)
      b.putInt(3).putInt(1).putInt(ring.size)
      ring.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
      b.array()
    }
    for (o <- Seq(ByteOrder.LITTLE_ENDIAN, ByteOrder.BIG_ENDIAN)) {
      val rings = ShapefileSource.readWkbPolygon(wkb(o))
      assert(rings.size == 1 && rings.head.size == 5 && rings.head(1) == ((10.0, 0.0)))
    }
  }

  test("inPolygonFlag: broadcast ray-cast over shapefile geometry") {
    // shapefile x = lon, y = lat; square covers lon 0..10, lat 0..10
    val pts = Seq((5.0, 5.0), (5.0, 15.0), (-1.0, 5.0)).toDF("lat", "lon")
    val flagged = ShapefileSource.inPolygonFlag(pts, "lat", "lon", writeShp(Seq(square)))
    val got = flagged.select("lat", "lon", "in_polygon")
      .as[(Double, Double, Boolean)].collect().toSet
    assert(got == Set((5.0, 5.0, true), (5.0, 15.0, false), (-1.0, 5.0, false)))
  }
}
