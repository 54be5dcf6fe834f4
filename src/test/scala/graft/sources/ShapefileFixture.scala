package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal ESRI `.shp` / dBASE III `.dbf` / WKB writers for spec
  * fixtures (shared by ShapefileSourceSpec and ShapefileFuzzSpec),
  * following the same public format specs the readers implement.
  */
object ShapefileFixture {

  /** Polygon-record `.shp` writer: one entry per record, each a list of
    * rings, each a list of (x, y).
    */
  def writeShp(records: Seq[Seq[Seq[(Double, Double)]]]): Array[Byte] = {
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
      val (xLo, xHi) =
        if (xs.isEmpty) (0.0, 0.0) else (xs.min, xs.max)
      val (yLo, yHi) =
        if (ys.isEmpty) (0.0, 0.0) else (ys.min, ys.max)
      b.putDouble(xLo).putDouble(yLo).putDouble(xHi).putDouble(yHi)
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

  /** dBASE III writer: character fields only. */
  def writeDbf(fields: Seq[(String, Int)], rows: Seq[Seq[String]]): Array[Byte] = {
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

  /** WKB polygon writer (either byte order). */
  def writeWkb(rings: Seq[Seq[(Double, Double)]], order: ByteOrder): Array[Byte] = {
    val n = rings.map(_.size).sum
    val b = ByteBuffer.allocate(9 + 4 * rings.size + 16 * n).order(order)
    b.put(if (order == ByteOrder.LITTLE_ENDIAN) 1.toByte else 0.toByte)
    b.putInt(3).putInt(rings.size)
    rings.foreach { ring =>
      b.putInt(ring.size)
      ring.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    }
    b.array()
  }
}
