package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal SQLite main-database writer for SqliteSourceSpec fixtures:
  * page 1 = header + sqlite_master leaf, page 2+ = table leaf pages,
  * then overflow pages for any record payload past the leaf max-local
  * threshold (round-11). Field layouts follow the public "SQLite
  * Database File Format".
  */
object SqliteFixture {

  private val PageSize = 4096
  // spill thresholds for a table leaf at zero reserved bytes: X = max
  // local payload, M = min local (the 32/255 rule)
  private val X = PageSize - 35
  private val M = (PageSize - 12) * 32 / 255 - 23

  /** One table of string/long columns. */
  def write(table: String, columns: Seq[(String, String)],
            rows: Seq[Seq[Any]]): Array[Byte] = {
    val createSql = s"CREATE TABLE $table (" +
      columns.map { case (n, t) => s"$n $t" }.mkString(", ") + ")"

    def varint(v: Long): Array[Byte] = {
      if (v < 0x80) Array(v.toByte)
      else {
        val parts = scala.collection.mutable.ArrayBuffer.empty[Byte]
        var x = v
        while (x > 0) { parts.prepend((x & 0x7f).toByte); x >>= 7 }
        (parts.init.map(b => (b | 0x80).toByte) :+ parts.last).toArray
      }
    }

    // minimal-width integer serial type, like real SQLite
    def intSerial(v: Long): (Long, Array[Byte]) = {
      def be(n: Int): Array[Byte] = {
        val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(v).array()
        b.takeRight(n)
      }
      if (v >= Byte.MinValue && v <= Byte.MaxValue) (1L, be(1))
      else if (v >= Short.MinValue && v <= Short.MaxValue) (2L, be(2))
      else if (v >= -(1L << 23) && v < (1L << 23)) (3L, be(3))
      else if (v >= Int.MinValue && v <= Int.MaxValue) (4L, be(4))
      else if (v >= -(1L << 47) && v < (1L << 47)) (5L, be(6))
      else (6L, be(8))
    }

    def record(values: Seq[Any]): Array[Byte] = {
      val encoded: Seq[(Long, Array[Byte])] = values.map {
        case null      => (0L, Array.empty[Byte])
        case l: Long   => intSerial(l)
        case i: Int    => intSerial(i.toLong)
        case d: Double => (7L, ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(d).array())
        case s: String =>
          val b = s.getBytes("UTF-8")
          (13L + 2L * b.length, b)
      }
      val typeBytes = encoded.map(_._1).flatMap(varint).toArray
      val headerLen = varint(typeBytes.length + 1) // assumes short header
      val body = encoded.flatMap(_._2).toArray
      headerLen ++ typeBytes ++ body
    }

    // overflow pages appended after all content pages, allocated as
    // cells spill; content page count is known up front (see below)
    val overflow = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val contentPages = if (rows.size >= 4) 4 else 2
    val firstOverflowPage = contentPages + 1

    def be4(v: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(v).array()

    /** Complete leaf cell for one record payload, spilling past-X
      * payloads to chained overflow pages like real SQLite: local
      * prefix K = M + (P - M) % (U - 4) when K <= X else M, then the
      * 4-byte first-overflow-page number.
      */
    def cell(payload: Array[Byte], rowid: Long): Array[Byte] = {
      val p = payload.length
      if (p <= X) varint(p.toLong) ++ varint(rowid) ++ payload
      else {
        val k = M + (p - M) % (PageSize - 4)
        val local = if (k <= X) k else M
        val rest = payload.drop(local)
        val chunk = PageSize - 4
        val nChunks = (rest.length + chunk - 1) / chunk
        val myFirst = firstOverflowPage + overflow.size
        for (c <- 0 until nChunks) {
          val pg = ByteBuffer.allocate(PageSize).order(ByteOrder.BIG_ENDIAN)
          pg.putInt(if (c == nChunks - 1) 0 else myFirst + c + 1)
          pg.put(rest.slice(c * chunk, math.min(rest.length, (c + 1) * chunk)))
          overflow += pg.array()
        }
        varint(p.toLong) ++ varint(rowid) ++ payload.take(local) ++ be4(myFirst)
      }
    }

    def leafPage(cells: Seq[Array[Byte]], headerOffset: Int): Array[Byte] = {
      val page = ByteBuffer.allocate(PageSize).order(ByteOrder.BIG_ENDIAN)
      var contentEnd = PageSize
      val ptrs = cells.map { cell =>
        contentEnd -= cell.length
        page.position(contentEnd)
        page.put(cell)
        contentEnd
      }
      val headerEnd = headerOffset + 8 + 2 * cells.size
      require(contentEnd >= headerEnd,
        s"fixture leaf overflows its page: content $contentEnd < header end $headerEnd")
      page.position(headerOffset)
      page.put(0x0d.toByte)
      page.putShort(0.toShort)
      page.putShort(cells.size.toShort)
      page.putShort(contentEnd.toShort)
      page.put(0.toByte)
      ptrs.foreach(p => page.putShort(p.toShort))
      page.array()
    }

    /** Interior table page: left-child cells + right-most pointer. */
    def interiorPage(children: Seq[(Int, Long)], rightMost: Int): Array[Byte] = {
      val page = ByteBuffer.allocate(PageSize).order(ByteOrder.BIG_ENDIAN)
      var contentEnd = PageSize
      val ptrs = children.map { case (child, key) =>
        val cell = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
          .putInt(child).array() ++ varint(key)
        contentEnd -= cell.length
        page.position(contentEnd)
        page.put(cell)
        contentEnd
      }
      page.position(0)
      page.put(0x05.toByte)
      page.putShort(0.toShort)
      page.putShort(children.size.toShort)
      page.putShort(contentEnd.toShort)
      page.put(0.toByte)
      page.putInt(rightMost)
      ptrs.foreach(p => page.putShort(p.toShort))
      page.array()
    }

    // >= 4 rows: exercise the interior-page path (root page 2 = interior
    // pointing at leaf pages 3 and 4); fewer rows: single leaf on page 2
    def cells(rs: Seq[Seq[Any]]): Seq[Array[Byte]] =
      rs.zipWithIndex.map { case (r, i) => cell(record(r), i + 1L) }
    val multiPage = rows.size >= 4
    val (rootPage2, extraPages) =
      if (multiPage) {
        val (a, b) = rows.splitAt(rows.size / 2)
        (interiorPage(Seq((3, a.size.toLong)), 4),
          Seq(leafPage(cells(a), 0), leafPage(cells(b), 0)))
      } else (leafPage(cells(rows), 0), Seq.empty[Array[Byte]])
    // page 1: sqlite_master with one row pointing at rootpage 2
    val masterRow = cell(record(Seq("table", table, table, 2L, createSql)), 1L)
    val page1 = leafPage(Seq(masterRow), 100)
    // database header over page 1's first 100 bytes
    val h = ByteBuffer.wrap(page1).order(ByteOrder.BIG_ENDIAN)
    h.position(0)
    h.put("SQLite format 3 ".getBytes("US-ASCII"))
    h.putShort(PageSize.toShort)
    h.put(1.toByte).put(1.toByte) // file format write/read versions
    h.put(0.toByte)               // reserved space
    h.put(64.toByte).put(32.toByte).put(32.toByte)
    h.putInt(0)  // change counter
    h.putInt(2 + extraPages.size + overflow.size) // database size in pages
    (extraPages ++ overflow).foldLeft(page1 ++ rootPage2)(_ ++ _)
  }

  /** Flips a main-file image's file-format read/write versions to 2
    * (WAL journal mode), as `PRAGMA journal_mode=WAL` does.
    */
  def toWalMode(main: Array[Byte]): Array[Byte] = {
    val out = main.clone()
    out(18) = 2; out(19) = 2
    out
  }

  /** Writes a `-wal` sidecar carrying the given transactions — each a
    * list of (pageNo, pageImage) with the last frame of each
    * transaction marked as a commit at `dbSizePages` — following the
    * public WAL format: 32-byte header (magic 0x377f0682 = little-
    * endian checksum words, salts, header checksum) then 24-byte frame
    * headers with the cumulative Fibonacci checksum chain. `stale`
    * appends checksum-valid frames under DIFFERENT salts after the real
    * ones: a reset WAL's leftover previous generation, which a
    * recovery-style reader must ignore.
    */
  def writeWal(txns: Seq[(Seq[(Int, Array[Byte])], Int)],
      salt1: Int = 0x11223344, salt2: Int = 0x55667788,
      stale: Seq[(Int, Array[Byte])] = Nil,
      bigWords: Boolean = false): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    def cksum(bytes: Array[Byte], s: (Int, Int)): (Int, Int) = {
      var (s0, s1) = s
      var i = 0
      while (i + 8 <= bytes.length) {
        // checksum word order rides in the magic's low bit:
        // 0x377f0682 = little-endian words, 0x377f0683 = big-endian
        def w(j: Int): Int =
          if (bigWords)
            ((bytes(j) & 0xff) << 24) | ((bytes(j + 1) & 0xff) << 16) |
              ((bytes(j + 2) & 0xff) << 8) | (bytes(j + 3) & 0xff)
          else
            ((bytes(j + 3) & 0xff) << 24) | ((bytes(j + 2) & 0xff) << 16) |
              ((bytes(j + 1) & 0xff) << 8) | (bytes(j) & 0xff)
        s0 += w(i) + s1
        s1 += w(i + 4) + s0
        i += 8
      }
      (s0, s1)
    }
    def be(vs: Int*): Array[Byte] = {
      val b = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.BIG_ENDIAN)
      vs.foreach(b.putInt)
      b.array()
    }
    val hdr24 = be(if (bigWords) 0x377f0683 else 0x377f0682,
      3007000, PageSize, 7, salt1, salt2)
    val hck = cksum(hdr24, (0, 0))
    buf.write(hdr24); buf.write(be(hck._1, hck._2))
    var chain = hck
    def frame(pno: Int, page: Array[Byte], dbSize: Int,
        s1v: Int, s2v: Int): Unit = {
      require(page.length == PageSize, s"frame page ${page.length}B")
      val pre = be(pno, dbSize)
      val next = cksum(page, cksum(pre, chain))
      buf.write(pre); buf.write(be(s1v, s2v, next._1, next._2)); buf.write(page)
      chain = next
    }
    for ((pages, dbSize) <- txns; ((pno, img), i) <- pages.zipWithIndex)
      frame(pno, img, if (i == pages.size - 1) dbSize else 0, salt1, salt2)
    // stale tail: previous-generation salts; chain continuity is
    // irrelevant once the salt check stops the scan
    for ((pno, img) <- stale)
      frame(pno, img, 1, salt1 ^ 0x5a5a5a5a, salt2)
    buf.toByteArray
  }

  /** The page images of a main-file byte array, 1-based page numbers. */
  def pages(main: Array[Byte]): Map[Int, Array[Byte]] =
    (0 until main.length / PageSize)
      .map(i => (i + 1) -> main.slice(i * PageSize, (i + 1) * PageSize)).toMap
}
