package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S10 shapefile / WKB polygon ingestion (SURVEY.md §2.1): coastline and
  * basin polygons arrive as ESRI shapefiles (`.shp` geometry + `.dbf`
  * attributes) — reference: ifcb-data-pipeline.Rmd:84-131 (near-land
  * buffer), 729-736 (`ifcb_is_in_basin`).
  *
  * Minimal readers for the public ESRI Shapefile and dBASE III specs
  * plus ISO WKB polygons: Polygon/PolygonZ/PolygonM shapes (Z/M values
  * ignored), character/numeric dBASE fields. Polygons land as driver-side
  * ring lists — basin/coastline shapes are KBs, so the reference's own
  * design (broadcast constant geometry, [[graft.functions.Geo
  * .pointInPolygon]] ray casting per row) carries over unchanged; nothing
  * here shuffles.
  */
object ShapefileSource {

  /** One polygon part (ring) with its record number and attributes. */
  final case class Ring(recordNo: Int, partNo: Int, points: Seq[(Double, Double)])

  /** Parses all polygon rings of a `.shp` main file.
    *
    * Fail-loudly contract (round-10 fuzz hardening, ShapefileFuzzSpec):
    * structural damage surfaces as [[IllegalArgumentException]] — never
    * a raw buffer exception, an unbounded allocation from a corrupted
    * count, or the infinite loop a negative record content length used
    * to cause (`p += 8 + contentLen` with contentLen = −8 advances zero
    * bytes).
    */
  def readShp(bytes: Array[Byte]): Seq[Ring] = {
    require(bytes.length >= 100, "not a shapefile: too short")
    val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, "not a shapefile: bad file code")
    try readShpBody(bytes, be)
    catch {
      case e: IllegalArgumentException => throw e
      case e: RuntimeException =>
        throw new IllegalArgumentException(s"malformed shapefile: $e", e)
    }
  }

  private def readShpBody(bytes: Array[Byte], be: ByteBuffer): Seq[Ring] = {
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val fileLen = be.getInt(24).toLong * 2 // 16-bit words → bytes
    // a corrupt header word count (negative after doubling, or short of
    // the 100-byte header) would make the record loop exit immediately
    // and return an EMPTY ring set silently — every downstream
    // near-land/basin flag then computes false with no error
    // (round-12 review; fail-loudly contract)
    require(fileLen >= 100,
      s"shapefile header claims $fileLen bytes (header alone is 100)")
    // claimed > actual = a truncated copy: reading "to whichever is
    // shorter" would silently drop the tail records
    require(fileLen <= bytes.length,
      s"shapefile truncated: header claims $fileLen bytes, file holds ${bytes.length}")
    val out = Seq.newBuilder[Ring]
    var p = 100
    while (p + 8 <= math.min(fileLen, bytes.length)) {
      val recordNo = be.getInt(p)
      val contentLen = be.getInt(p + 4) * 2
      // a record's content holds at least the shape type word; anything
      // smaller (or negative) cannot advance the cursor — corrupt
      require(contentLen >= 4,
        s"record $recordNo claims content length $contentLen")
      val shapeType = le.getInt(p + 8)
      shapeType match {
        case 5 | 15 | 25 => // Polygon / PolygonZ / PolygonM — rings in XY
          val base = p + 8 + 4 + 32 // type + box
          val numParts = le.getInt(base)
          val numPoints = le.getInt(base + 4)
          // counts sized beyond the file are corruption, not data — and
          // must not drive the point-materializing loops below
          require(numParts >= 0 && numPoints >= 0 &&
            base + 8 + 4L * numParts + 16L * numPoints <= bytes.length,
            s"record $recordNo claims $numParts parts / $numPoints points " +
              s"past file end ${bytes.length}")
          val partsOff = base + 8
          val pointsOff = partsOff + 4 * numParts
          val parts = (0 until numParts).map(i => le.getInt(partsOff + 4 * i))
          for (part <- 0 until numParts) {
            val from = parts(part)
            val until = if (part + 1 < numParts) parts(part + 1) else numPoints
            // from <= until too (round-12 review): non-ascending part
            // offsets would emit a silently EMPTY ring and every
            // point-in-polygon flag would read false with no error
            require(from >= 0 && from <= until && until <= numPoints,
              s"record $recordNo part $part range [$from, $until) outside " +
                s"[0, $numPoints) or non-ascending")
            val pts = (from until until).map { i =>
              (le.getDouble(pointsOff + 16 * i), le.getDouble(pointsOff + 16 * i + 8))
            }
            out += Ring(recordNo, part, pts)
          }
        case 0 => () // null shape
        case t => throw new IllegalArgumentException(
          s"unsupported shape type $t (reader covers Polygon/PolygonZ/PolygonM)")
      }
      p += 8 + contentLen
    }
    out.result()
  }

  /** Parses a dBASE III `.dbf` attribute table → one string map per
    * record (numeric fields kept as trimmed strings; callers cast).
    */
  def readDbf(bytes: Array[Byte]): Seq[Map[String, String]] = {
    try {
    require(bytes.length >= 33, "not a dBASE file: too short")
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nRecords = le.getInt(4)
    val headerLen = le.getShort(8) & 0xffff
    val recordLen = le.getShort(10) & 0xffff
    // fail-loudly (round-10 fuzz hardening): corrupted counts must not
    // hang a 2-billion-iteration record loop or read past the file
    require(nRecords >= 0 && (nRecords == 0 || recordLen >= 1),
      s"dBASE claims $nRecords records of length $recordLen")
    // +1: the end-of-file 0x1A marker may replace the last pad byte
    require(headerLen + nRecords.toLong * recordLen <= bytes.length + 1,
      s"dBASE claims $nRecords records of $recordLen bytes past file " +
        s"end ${bytes.length}")
    // field descriptors: 32 bytes each from offset 32 until 0x0D terminator
    val fields = Seq.newBuilder[(String, Int)]
    var p = 32
    while (p < headerLen - 1 && bytes(p) != 0x0d) {
      val name = new String(bytes, p, 11, "US-ASCII").takeWhile(_ != '\u0000').trim
      val len = bytes(p + 16) & 0xff
      fields += ((name, len))
      p += 32
    }
    val fs = fields.result()
    // a recordLen smaller than the declared fields (one corrupt byte)
    // would read every row after the first SHIFTED — silently wrong
    // attribute values; recordLen may exceed the sum (trailing pad) but
    // never undercut it
    require(recordLen >= 1 + fs.map(_._2).sum,
      s"dBASE record length $recordLen undercuts 1 + field lengths " +
        s"${fs.map(_._2).sum}")
    (0 until nRecords).map { r =>
      var q = headerLen + r * recordLen + 1 // +1 deletion flag
      fs.map { case (name, len) =>
        val v = new String(bytes, q, len, "US-ASCII").trim
        q += len
        name -> v
      }.toMap
    }
    } catch {
      case e: IllegalArgumentException => throw e
      case e: RuntimeException =>
        throw new IllegalArgumentException(s"malformed dBASE file: $e", e)
    }
  }

  /** Driver-side load of a `.shp`+`.dbf` pair → named polygons:
    * (attributes, outer/inner rings by record). The per-record attribute
    * map joins by shapefile record order (dBASE row i = shape record
    * i+1).
    */
  def readPolygons(shp: Array[Byte], dbf: Option[Array[Byte]]): Seq[(Map[String, String], Seq[Ring])] = {
    val rings = readShp(shp).groupBy(_.recordNo).toSeq.sortBy(_._1)
    val attrs = dbf.map(readDbf).getOrElse(Seq.empty)
    rings.map { case (recNo, rs) =>
      val a = if (recNo - 1 < attrs.length) attrs(recNo - 1) else Map.empty[String, String]
      (a, rs.sortBy(_.partNo))
    }
  }

  /** ISO WKB polygon → rings (XY only; both byte orders). Fail-loudly:
    * ring/point counts past the buffer raise [[IllegalArgumentException]]
    * before any count-sized materialization.
    */
  def readWkbPolygon(wkb: Array[Byte]): Seq[Seq[(Double, Double)]] = {
    try {
      require(wkb.length >= 9, "not a WKB polygon: too short")
      val order = if (wkb(0) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
      val b = ByteBuffer.wrap(wkb).order(order)
      // full unmasked type (round-12 review): `& 0xff` accepted EWKB
      // flag bits — a PolygonZ (0x80000003) has 24-byte points and the
      // 16-byte stride below would silently garble every ring, and an
      // SRID-flagged polygon would read its SRID as the ring count
      val geomType = b.getInt(1)
      require(geomType == 3,
        s"not a plain XY WKB polygon (type 0x${geomType.toHexString}: " +
          "EWKB Z/M/SRID variants are out of scope)")
      val nRings = b.getInt(5)
      require(nRings >= 0 && 9L + 4L * nRings <= wkb.length,
        s"WKB claims $nRings rings past buffer end ${wkb.length}")
      var p = 9
      (0 until nRings).map { _ =>
        val n = b.getInt(p)
        p += 4
        require(n >= 0 && p + 16L * n <= wkb.length,
          s"WKB ring claims $n points past buffer end ${wkb.length}")
        val ring = (0 until n).map { i =>
          (b.getDouble(p + 16 * i), b.getDouble(p + 16 * i + 8))
        }
        p += 16 * n
        ring
      }
    } catch {
      case e: IllegalArgumentException => throw e
      case e: RuntimeException =>
        throw new IllegalArgumentException(s"malformed WKB polygon: $e", e)
    }
  }

  /** Flags rows whose (lat, lon) falls inside the named polygon read from
    * a shapefile — `ifcb_is_in_basin` re-expressed: polygon broadcast as a
    * constant into [[graft.functions.Geo.pointInPolygon]] ray casting.
    * Shapefile x = longitude, y = latitude.
    *
    * ALL parts of the record participate by even-odd counting (round-14
    * review: testing only part 0 flagged points inside an island HOLE as
    * in-basin and points in a second outer part as outside): a point is
    * inside iff it falls in an ODD number of rings — the standard
    * even-odd rule that handles both holes (outer + hole = even = out)
    * and disjoint outer parts, matching how `Maps` consumes multi-ring
    * land polygons.
    */
  def inPolygonFlag(df: DataFrame, lat: String, lon: String,
                    shp: Array[Byte], recordNo: Int = 1): DataFrame = {
    val rings = readShp(shp).filter(_.recordNo == recordNo)
    require(rings.nonEmpty, s"no record $recordNo")
    val tests = rings.map { r =>
      graft.functions.Geo.pointInPolygon(r.points.map { case (x, y) => (y, x) })
    }
    val oddCount = tests
      .map(t => when(t(col(lat), col(lon)), 1).otherwise(0))
      .reduce(_ + _) % 2 === 1
    df.withColumn("in_polygon", oddCount)
  }
}
