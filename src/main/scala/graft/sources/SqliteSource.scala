package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S6 SQLite source (SURVEY.md §2.1): manual annotations live in a
  * SQLite database's `annotations` table (reference:
  * code/ifcb_delivery_data_to_shark.R:236-243), driving the `manual`
  * delivery variant.
  *
  * No JDBC driver is available offline, so this is a minimal reader for
  * the public "SQLite Database File Format" covering what annotation
  * databases need: table B-trees (interior + leaf pages), record serial
  * types (null, ints, float, text), chained overflow pages (a long
  * `comment`/`class_name` string spilling past the leaf max-local
  * threshold — round-11), column names parsed from the sqlite_master
  * schema row. Not covered (rejected loudly): WAL mode side files,
  * indexes.
  *
  * Spark shape: like [[MatSource]] — small per-deployment files via
  * `binaryFile`, parsed in executors, exploded to relational rows.
  */
object SqliteSource {

  final case class Table(columns: Seq[String], rows: Seq[Seq[Any]])

  /** Reads one table of a SQLite main-database byte image.
    *
    * Fail-loudly contract: structural damage surfaces as
    * [[IllegalArgumentException]] — never a raw buffer/index exception,
    * an unbounded-recursion stack overflow (cyclic page pointers), or an
    * allocation sized from a corrupted serial type (round-10 fuzz
    * hardening; exercised by SqliteFuzzSpec's byte-mutation corpus).
    */
  def readTable(bytes: Array[Byte], table: String): Table = {
    require(bytes.length >= 512, "not a SQLite file: too short")
    val magic = new String(bytes, 0, 16, "US-ASCII")
    require(magic.startsWith("SQLite format 3"), "not a SQLite file")
    // header byte 19 = file-format read version; 2 means WAL journal
    // mode, where un-checkpointed transactions live in the -wal side
    // file this reader never sees — reading just the main file would
    // silently return stale rows, the worst failure class
    val readVersion = bytes(19) & 0xff
    require(readVersion <= 1,
      s"WAL-mode database (read version $readVersion): un-checkpointed " +
        "state in the -wal side file would be silently missed; " +
        "checkpoint the database (PRAGMA wal_checkpoint) before export")
    try readTableBody(bytes, table)
    catch {
      case e: IllegalArgumentException => throw e
      case e: RuntimeException =>
        throw new IllegalArgumentException(s"malformed SQLite file: $e", e)
    }
  }

  private def readTableBody(bytes: Array[Byte], table: String): Table = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val pageSizeRaw = buf.getShort(16) & 0xffff
    val pageSize = if (pageSizeRaw == 1) 65536 else pageSizeRaw
    // bytes reserved at the end of every page (header offset 20) shrink
    // the usable size every spill threshold derives from
    val usable = pageSize - (buf.get(20) & 0xff)
    // sqlite_master b-tree lives on page 1 (header occupies first 100 bytes)
    val master = walkTable(buf, pageSize, usable, 1)
    val (rootPage, createSql) = master.collectFirst {
      case (_, Seq(tpe: String, name: String, _, root: Long, sql: String))
        if tpe == "table" && name == table => (root.toInt, sql)
    }.getOrElse(throw new IllegalArgumentException(s"table $table not found"))
    val columns = parseColumns(createSql)
    val rows = walkTable(buf, pageSize, usable, rootPage)
    // INTEGER PRIMARY KEY is a rowid alias: the record stores NULL and
    // the real value rides in the cell's rowid (SQLite file format 2.1)
    val subbed = rowidAliasIndex(createSql) match {
      case Some(i) =>
        rows.map { case (rid, vals) =>
          if (i < vals.length && vals(i) == null) vals.updated(i, rid) else vals
        }
      case None => rows.map(_._2)
    }
    Table(columns, subbed)
  }

  /** Index of the column declared `INTEGER PRIMARY KEY` (the rowid
    * alias), if any.
    */
  private[sources] def rowidAliasIndex(sql: String): Option[Int] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    val defs = splitTopLevel(body)
      .filterNot(c => Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
        .contains(c.split("[\\s(]+").head.toUpperCase))
    val i = defs.indexWhere(
      _.toUpperCase.matches("""(?s).*\bINTEGER\s+PRIMARY\s+KEY\b.*"""))
    if (i >= 0) Some(i) else None
  }

  /** Splits a CREATE TABLE body on commas at paren depth 0 only —
    * `DECIMAL(10,2)` or `CHECK(x IN (1,2))` must not produce phantom
    * column definitions that shift every later column's index.
    */
  private def splitTopLevel(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Column names from a CREATE TABLE statement (good enough for the
    * plain comma-separated definitions annotation tools write).
    */
  private[sources] def parseColumns(sql: String): Seq[String] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    splitTopLevel(body)
      .filterNot(c => Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
        .contains(c.split("[\\s(]+").head.toUpperCase))
      .map { c =>
        // quoted identifiers may contain spaces: "b c" / [b c] / `b c`
        val closer = Map('"' -> '"', '[' -> ']', '`' -> '`')
        c.headOption.flatMap(closer.get) match {
          case Some(close) => c.substring(1, c.indexOf(close, 1))
          case None        => c.split("\\s+").head
        }
      }
      .toSeq
  }

  /** In-order traversal of a table B-tree: (rowid, decoded record) per
    * leaf cell. Depth-capped: a corrupted child pointer can form a
    * cycle; genuine SQLite trees are far shallower than 32 levels.
    */
  private def walkTable(buf: ByteBuffer, pageSize: Int, usable: Int,
      page: Int, depth: Int = 0): Seq[(Long, Seq[Any])] = {
    require(depth < 32, s"table B-tree deeper than 32 at page $page: cyclic page pointers")
    val base = (page - 1) * pageSize
    val hdr = base + (if (page == 1) 100 else 0)
    val pageType = buf.get(hdr) & 0xff
    val nCells = buf.getShort(hdr + 3) & 0xffff
    pageType match {
      case 0x0d => // leaf table
        (0 until nCells).map { i =>
          val cellPtr = base + (buf.getShort(hdr + 8 + 2 * i) & 0xffff)
          var p = cellPtr
          val (payloadLen, p1) = varint(buf, p); p = p1
          val (rowid, p2) = varint(buf, p); p = p2
          // a payload past the leaf max-local threshold X = U - 35
          // spills to chained overflow pages: only a local prefix sits
          // in the cell, followed by the 4-byte first-overflow-page
          // number — reading straight through the pointer would
          // silently misparse, so spilled payloads are reassembled
          if (payloadLen <= usable - 35)
            rowid -> record(buf, p, payloadLen.toInt)
          else {
            val payload = assembleSpilled(buf, pageSize, usable, p, payloadLen)
            val pb = ByteBuffer.wrap(payload).order(ByteOrder.BIG_ENDIAN)
            rowid -> record(pb, 0, payload.length)
          }
        }
      case 0x05 => // interior table: cells carry left-child pointers
        val kids = (0 until nCells).map { i =>
          val cellPtr = base + (buf.getShort(hdr + 12 + 2 * i) & 0xffff)
          buf.getInt(cellPtr)
        } :+ buf.getInt(hdr + 8) // right-most pointer
        kids.flatMap(walkTable(buf, pageSize, usable, _, depth + 1))
      case t => throw new IllegalArgumentException(s"unsupported page type 0x${t.toHexString}")
    }
  }

  /** Reassembles a spilled table-leaf payload: the local prefix from the
    * cell, the rest from the chain of overflow pages (each: 4-byte next
    * page number, 0-terminated, then U-4 content bytes). Spill
    * arithmetic per the file-format spec's B-tree section: with
    * U = usable page size, X = U - 35 (leaf max local), M = the 32/255
    * minimum, the local prefix is K = M + (P - M) % (U - 4) when K ≤ X,
    * else M. Corruption (chain ending early, out-of-file pages, cyclic
    * pointers) rejects via the module's IllegalArgumentException
    * contract before any data-sized allocation.
    */
  private def assembleSpilled(buf: ByteBuffer, pageSize: Int, usable: Int,
      localStart: Int, payloadLen: Long): Array[Byte] = {
    val u = usable.toLong
    val x = u - 35
    val m = (u - 12) * 32 / 255 - 23
    val k = m + (payloadLen - m) % (u - 4)
    val local = (if (k <= x) k else m).toInt
    // a corrupted length must not drive a data-sized allocation: the
    // payload cannot exceed the file it came from
    require(payloadLen >= 0 && payloadLen <= buf.limit(),
      s"spilled payload $payloadLen exceeds file size ${buf.limit()}")
    // subtraction-side bound: localStart + local + 4 can wrap negative
    // in Int arithmetic near the 2 GiB byte-array limit, which would
    // pass an addition-side check and die later with a raw
    // IndexOutOfBounds (the H5Source guard-class fix, applied here too)
    require(localStart >= 0 && localStart <= buf.limit() - 4 &&
        local <= buf.limit() - 4 - localStart,
      s"overflow-spilled cell local prefix at $localStart (+$local+4) " +
        s"runs past file end ${buf.limit()}")
    val out = new Array[Byte](payloadLen.toInt)
    var i = 0
    while (i < local) { out(i) = buf.get(localStart + i); i += 1 }
    var next = buf.getInt(localStart + local)
    var off = local
    var hops = 0
    val maxHops = (payloadLen / math.max(1L, u - 4)).toInt + 2
    while (off < payloadLen) {
      require(next > 0,
        s"overflow chain ends at byte $off of $payloadLen (next page $next)")
      hops += 1
      require(hops <= maxHops,
        s"overflow chain longer than the payload requires: cyclic page pointers")
      val base = (next - 1).toLong * pageSize
      require(base >= 0 && base + pageSize <= buf.limit(),
        s"overflow page $next outside the file")
      val take = math.min(u - 4, payloadLen - off).toInt
      var j = 0
      while (j < take) { out(off + j) = buf.get((base + 4 + j).toInt); j += 1 }
      off += take
      next = buf.getInt(base.toInt)
    }
    out
  }

  /** One record: header of serial types, then values. */
  private def record(buf: ByteBuffer, start: Int, payloadLen: Int): Seq[Any] = {
    val (headerLen, afterHeaderLen) = varint(buf, start)
    var p = afterHeaderLen
    val headerEnd = start + headerLen.toInt
    val types = Seq.newBuilder[Long]
    while (p < headerEnd) {
      val (t, np) = varint(buf, p)
      types += t
      p = np
    }
    var q = headerEnd
    types.result().map { t =>
      val (v, nq) = value(buf, q, t)
      q = nq
      v
    }
  }

  private def value(buf: ByteBuffer, p: Int, serial: Long): (Any, Int) = serial match {
    case 0 => (null, p)
    case 1 => (buf.get(p).toLong, p + 1)
    case 2 => (buf.getShort(p).toLong, p + 2)
    case 3 => ((((buf.get(p).toLong << 16) | ((buf.get(p + 1) & 0xffL) << 8) |
                 (buf.get(p + 2) & 0xffL))), p + 3)
    case 4 => (buf.getInt(p).toLong, p + 4)
    case 5 => (((buf.getShort(p).toLong << 32) | (buf.getInt(p + 2).toLong & 0xffffffffL)), p + 6)
    case 6 => (buf.getLong(p), p + 8)
    case 7 => (buf.getDouble(p), p + 8)
    case 8 => (0L, p)
    case 9 => (1L, p)
    case t if t >= 13 && t % 2 == 1 =>
      val n = boundedLen((t - 13) / 2, buf, p)
      val b = new Array[Byte](n)
      for (i <- 0 until n) b(i) = buf.get(p + i)
      (new String(b, "UTF-8"), p + n)
    case t if t >= 12 =>
      val n = boundedLen((t - 12) / 2, buf, p)
      val b = new Array[Byte](n)
      for (i <- 0 until n) b(i) = buf.get(p + i)
      (b, p + n)
    case t => throw new IllegalArgumentException(s"serial type $t")
  }

  /** A text/blob length decoded from a corrupted serial type must not
    * drive a giant allocation before the read fails — it cannot extend
    * past the file.
    */
  private def boundedLen(n: Long, buf: ByteBuffer, p: Int): Int = {
    require(n >= 0 && p + n <= buf.limit(),
      s"text/blob of $n bytes at $p runs past file end ${buf.limit()}")
    n.toInt
  }

  /** Big-endian 7-bit varint (9th byte carries 8 bits); returns
    * (value, next offset).
    */
  private def varint(buf: ByteBuffer, start: Int): (Long, Int) = {
    var v = 0L
    var p = start
    var i = 0
    while (i < 8) {
      val b = buf.get(p) & 0xff
      p += 1
      v = (v << 7) | (b & 0x7f)
      if ((b & 0x80) == 0) return (v, p)
      i += 1
    }
    val b = buf.get(p) & 0xff
    ((v << 8) | b, p + 1)
  }

  // --- relational views ----------------------------------------------------

  /** Manual-annotation databases → rows, with the reference's derived
    * `image_name` (sample_name + zero-padded ROI,
    * ifcb_delivery_data_to_shark.R:241-243).
    */
  def annotations(spark: SparkSession, dir: String,
                  table: String = "annotations"): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.db").load(dir)
      .select(col("path"), col("content"))
    val rows = files.as[(String, Array[Byte])].flatMap { case (_, bytes) =>
      val t = readTable(bytes, table)
      val ci = t.columns.zipWithIndex.toMap
      def str(r: Seq[Any], c: String): String =
        ci.get(c).map(r(_)).map { case null => null; case v => v.toString }.orNull
      def num(r: Seq[Any], c: String): Long =
        ci.get(c).map(r(_)).collect { case l: Long => l; case d: Double => d.toLong }.getOrElse(0L)
      t.rows.map { r =>
        (str(r, "sample_name"), num(r, "roi_number").toInt, str(r, "class_name"),
          str(r, "annotator"), str(r, "timestamp"))
      }
    }
    rows.toDF("sample_name", "roi_number", "class_name", "annotator", "timestamp")
      .withColumn("image_name",
        concat(col("sample_name"), lit("_"), format_string("%05d", col("roi_number"))))
  }
}
