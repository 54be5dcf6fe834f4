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
  * schema row, and (round-12) WAL-mode databases via the `-wal` sidecar:
  * committed frames are recovered exactly like SQLite's own WAL recovery
  * (salt match + cumulative checksum, up to the last commit frame) and
  * overlaid over the main-file pages, so a production annotations DB
  * whose client defaults to `journal_mode=WAL` reads its un-checkpointed
  * commits instead of silently-stale main-file rows. A WAL-mode main
  * file WITHOUT its sidecar still rejects loudly — "checkpointed and
  * deleted" is indistinguishable from "forgot to copy the -wal", and
  * the second silently loses commits. Not covered (rejected loudly):
  * hot rollback journals, indexes.
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
  def readTable(bytes: Array[Byte], table: String): Table =
    readTable(bytes, table, None)

  /** As [[readTable]], with the `-wal` sidecar's bytes when the caller
    * has them. Header byte 19 = file-format read version; 2 means WAL
    * journal mode, where un-checkpointed transactions live in the -wal
    * side file — reading just the main file would silently return stale
    * rows, the worst failure class, so a WAL-mode main file without a
    * sidecar rejects loudly. With the sidecar, committed frames are
    * overlaid ([[applyWal]]) before parsing. A rollback-journal main
    * file ignores any `wal` argument the way SQLite ignores a stale
    * -wal left behind by a journal-mode switch.
    */
  def readTable(bytes: Array[Byte], table: String,
      wal: Option[Array[Byte]]): Table = {
    require(bytes.length >= 512, "not a SQLite file: too short")
    val magic = new String(bytes, 0, 16, "US-ASCII")
    require(magic.startsWith("SQLite format 3"), "not a SQLite file")
    val readVersion = bytes(19) & 0xff
    require(readVersion <= 2, s"unknown file-format read version $readVersion")
    require(readVersion <= 1 || wal.isDefined,
      s"WAL-mode database (read version $readVersion) with no -wal " +
        "sidecar: un-checkpointed state would be silently missed; pass " +
        "the -wal file alongside, or checkpoint the database " +
        "(PRAGMA wal_checkpoint(TRUNCATE)) before export")
    val effective =
      if (readVersion <= 1) bytes
      else try applyWal(bytes, wal.get)
      catch {
        case e: IllegalArgumentException => throw e
        case e: RuntimeException =>
          throw new IllegalArgumentException(s"malformed WAL sidecar: $e", e)
      }
    try readTableBody(effective, table)
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
    // header geometry validation, the applyWal discipline (round-12
    // review): a corrupt page-size short (0, 300) drives nonsense page
    // bases and negative spill thresholds — garbage offsets at best
    // parse coincidental 0x0d bytes as rows
    require(pageSize >= 512 && pageSize <= 65536 &&
      (pageSize & (pageSize - 1)) == 0,
      s"malformed SQLite page size $pageSize (must be a power of two in [512, 65536])")
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

  /** Overlays the committed frames of a `-wal` sidecar over a main-file
    * byte image — SQLite's own shm-free WAL recovery procedure (the
    * wal-format section of the public file-format spec): start after
    * the 32-byte WAL header, accept frames while their salts match the
    * header and the cumulative checksum chain holds, and make visible
    * everything up to the LAST commit frame (nonzero db-size field).
    * Latest frame per page wins; the result is sized to that commit's
    * db size (WAL commits can both grow and truncate the database).
    *
    * A salt or checksum mismatch mid-file is a NORMAL stop, not
    * corruption: a reset WAL legitimately carries stale tail frames
    * from the previous generation, and a crash tears the tail mid-frame
    * — the committed prefix is exactly what SQLite would recover. An
    * invalid 32-byte header, by contrast, rejects loudly (the
    * fail-loudly contract: it is indistinguishable from transit
    * corruption, and "no frames" would silently drop commits); a
    * checkpointed-and-truncated sidecar (length < 32) genuinely carries
    * no frames and reads as main-only.
    */
  private[sources] def applyWal(main: Array[Byte], wal: Array[Byte]): Array[Byte] = {
    if (wal.length < 32) return main
    val wb = ByteBuffer.wrap(wal).order(ByteOrder.BIG_ENDIAN)
    val magic = wb.getInt(0)
    require(magic == 0x377f0682 || magic == 0x377f0683,
      f"bad WAL magic 0x$magic%08x")
    // the magic's low bit selects the checksum's 32-bit word order
    val bigWords = magic == 0x377f0683
    val version = wb.getInt(4)
    require(version == 3007000, s"unsupported WAL format version $version")
    val pageSize = wb.getInt(8)
    require(pageSize >= 512 && pageSize <= 65536 &&
      (pageSize & (pageSize - 1)) == 0, s"WAL page size $pageSize")
    val mainPsRaw = ByteBuffer.wrap(main).order(ByteOrder.BIG_ENDIAN)
      .getShort(16) & 0xffff
    val mainPs = if (mainPsRaw == 1) 65536 else mainPsRaw
    require(pageSize == mainPs,
      s"WAL page size $pageSize != main-file page size $mainPs")
    val salt1 = wb.getInt(16)
    val salt2 = wb.getInt(20)
    var (s0, s1) = walCksum(wal, 0, 24, bigWords, 0, 0)
    require(s0 == wb.getInt(24) && s1 == wb.getInt(28),
      "WAL header checksum mismatch")
    val frameSize = 24L + pageSize
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var lastCommit = 0 // frames included through the last commit frame
    var commitDbSize = 0
    var off = 32L
    var stop = false
    while (!stop && off + frameSize <= wal.length) {
      val o = off.toInt
      val pno = wb.getInt(o)
      val dbSize = wb.getInt(o + 4)
      if (wb.getInt(o + 8) != salt1 || wb.getInt(o + 12) != salt2) stop = true
      else {
        val (a0, a1) = walCksum(wal, o, 8, bigWords, s0, s1)
        val (b0, b1) = walCksum(wal, o + 24, pageSize, bigWords, a0, a1)
        if (b0 != wb.getInt(o + 16) || b1 != wb.getInt(o + 20)) stop = true
        else {
          s0 = b0; s1 = b1
          // checksum-valid but structurally impossible — corruption, not
          // a torn tail
          require(pno >= 1, s"WAL frame targets page $pno")
          frames += ((pno, o + 24))
          if (dbSize != 0) { lastCommit = frames.length; commitDbSize = dbSize }
          off += frameSize
        }
      }
    }
    if (lastCommit == 0) return main // no committed frames
    // allocation bound before sizing anything from file-claimed values:
    // every page past the main file's end must have been written via
    // THIS wal, so the commit size cannot exceed main pages + committed
    // frames — a crafted db-size field cannot drive a giant allocation
    val mainPages = (main.length.toLong + pageSize - 1) / pageSize
    require(commitDbSize >= 1 && commitDbSize <= mainPages + lastCommit,
      s"WAL commit claims $commitDbSize pages but main holds $mainPages " +
        s"and the wal commits $lastCommit frames")
    val outLen = commitDbSize.toLong * pageSize
    require(outLen <= Int.MaxValue, s"database of $outLen bytes")
    val out = new Array[Byte](outLen.toInt)
    System.arraycopy(main, 0, out, 0, math.min(main.length.toLong, outLen).toInt)
    frames.take(lastCommit).foreach { case (pno, doff) =>
      // frames for pages past the final size were truncated by the commit
      if (pno <= commitDbSize)
        System.arraycopy(wal, doff, out, ((pno - 1).toLong * pageSize).toInt, pageSize)
    }
    out
  }

  /** The WAL checksum: a Fibonacci-weighted sum over 32-bit words in
    * the byte order the header magic selects; `len` is always a
    * multiple of 8 here (24-byte header, 8-byte frame-header prefix,
    * power-of-two page sizes).
    */
  private def walCksum(bytes: Array[Byte], start: Int, len: Int,
      bigWords: Boolean, in0: Int, in1: Int): (Int, Int) = {
    def word(i: Int): Int =
      if (bigWords)
        ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
          ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      else
        ((bytes(i + 3) & 0xff) << 24) | ((bytes(i + 2) & 0xff) << 16) |
          ((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)
    var s0 = in0
    var s1 = in1
    var i = start
    val end = start + len
    while (i + 8 <= end) {
      s0 += word(i) + s1
      s1 += word(i + 4) + s0
      i += 8
    }
    (s0, s1)
  }

  /** Index of the rowid-alias column, if any: a column declared
    * `INTEGER PRIMARY KEY [ASC]` inline, OR (round-15 review) an
    * INTEGER-typed column named by a single-column table-level
    * `PRIMARY KEY(col [ASC|DESC])` constraint — SQLite treats both as
    * the rowid alias and stores NULL in the record, so missing either
    * form reads a well-formed table's key column as all-null. The
    * spec's ONE non-alias exception is the INLINE `x INTEGER PRIMARY
    * KEY DESC` declaration (a kept-for-compatibility quirk); the
    * table-level DESC form IS an alias — round-16 advice caught these
    * two inverted, which silently nulled `PRIMARY KEY(col DESC)`
    * tables' keys. Composite keys are never aliases.
    */
  private[sources] def rowidAliasIndex(sql: String): Option[Int] = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    val parts = splitTopLevel(body)
    val isConstraint = (c: String) =>
      Set("PRIMARY", "UNIQUE", "CHECK", "FOREIGN", "CONSTRAINT")
        .contains(c.split("[\\s(]+").head.toUpperCase)
    val defs = parts.filterNot(isConstraint)
    // negative lookahead: `INTEGER PRIMARY KEY DESC` is the inline
    // exception (ASC, ON CONFLICT, AUTOINCREMENT all still alias)
    val inline = defs.indexWhere(_.toUpperCase.matches(
      """(?s).*\bINTEGER\s+PRIMARY\s+KEY\b(?!\s+DESC\b).*"""))
    if (inline >= 0) Some(inline)
    else {
      // identifier may be quoted ("col" / [col] / `col`) and carry an
      // ASC|DESC ordering — both alias at table level
      val TableLevel =
        ("""(?is).*\bPRIMARY\s+KEY\s*\(\s*("[^"]+"|\[[^\]]+\]|`[^`]+`""" +
          """|[A-Za-z_][A-Za-z0-9_]*)(\s+(?:ASC|DESC))?\s*\).*""").r
      parts.filter(isConstraint).collectFirst {
        case TableLevel(colName, _) => unquote(colName)
      }.flatMap { colName =>
        val i = defs.indexWhere { d =>
          defName(d).equalsIgnoreCase(colName) &&
            d.toUpperCase.matches("""(?s).*\bINTEGER\b.*""")
        }
        if (i >= 0) Some(i) else None
      }
    }
  }

  /** The declared name of a column definition: the leading token,
    * unquoted — quoted identifiers may contain spaces ("b c" / [b c] /
    * `b c`), so a bare whitespace split is wrong for them.
    */
  private def defName(c: String): String =
    c.headOption.flatMap(identCloser.get) match {
      case Some(close) => c.substring(1, c.indexOf(close, 1))
      case None        => c.split("\\s+").head
    }

  private val identCloser = Map('"' -> '"', '[' -> ']', '`' -> '`')

  /** Strips one layer of identifier quoting from a standalone token. */
  private def unquote(id: String): String =
    id.headOption.flatMap(identCloser.get) match {
      case Some(close) if id.length >= 2 && id.last == close =>
        id.substring(1, id.length - 1)
      case _ => id
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
      .map(defName)
      .toSeq
  }

  /** In-order traversal of a table B-tree: (rowid, decoded record) per
    * leaf cell. Depth-capped: a corrupted child pointer can form a
    * cycle; genuine SQLite trees are far shallower than 32 levels.
    */
  private def walkTable(buf: ByteBuffer, pageSize: Int, usable: Int,
      page: Int, depth: Int = 0): Seq[(Long, Seq[Any])] = {
    require(depth < 32, s"table B-tree deeper than 32 at page $page: cyclic page pointers")
    // Long-range bound BEFORE the Int truncation (round-12 review, the
    // assembleSpilled/H5 discipline): a corrupt child pointer like
    // 0x00100042 times pageSize wraps mod 2^32 onto a VALID in-file
    // page, silently merging another table's rows into the result
    val baseL = (page - 1).toLong * pageSize
    require(page >= 1 && baseL + pageSize <= buf.limit(),
      s"B-tree page $page outside the ${buf.limit()}-byte file: corrupt page pointer")
    val base = baseL.toInt
    val hdr = base + (if (page == 1) 100 else 0)
    val pageType = buf.get(hdr) & 0xff
    val nCells = buf.getShort(hdr + 3) & 0xffff
    // a cell OFFSET is page-relative and must stay inside this page
    // (round-15 review): with a 512-byte page a corrupt 0xFFFF pointer
    // lands pages away but still in-file, where varint+record decode
    // unrelated bytes into a plausible garbage row — the same
    // silent-wrong-data class the page-number guard above closes
    def cellAt(off: Int): Int = {
      val rel = buf.getShort(off) & 0xffff
      require(rel >= 0 && rel < pageSize,
        s"page $page: cell pointer $rel outside the $pageSize-byte page")
      base + rel
    }
    pageType match {
      case 0x0d => // leaf table
        (0 until nCells).map { i =>
          val cellPtr = cellAt(hdr + 8 + 2 * i)
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
          buf.getInt(cellAt(hdr + 12 + 2 * i))
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

  /** One record: header of serial types, then values. Every read is
    * bounded by `payloadLen` (round-14 review: the parameter was
    * accepted but unused, so a corrupt header-length varint or an
    * oversized serial type silently decoded the NEIGHBORING cell's
    * bytes as this row's values — the spilled path was bounded by its
    * own buffer, the in-page path was not).
    */
  private def record(buf: ByteBuffer, start: Int, payloadLen: Int): Seq[Any] = {
    val (headerLen, afterHeaderLen) = varint(buf, start)
    val recordEnd = start.toLong + payloadLen
    require(headerLen >= 0 && start + headerLen <= recordEnd,
      s"record header of $headerLen bytes exceeds the $payloadLen-byte payload")
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
      require(nq <= recordEnd,
        s"serial type $t reads to byte ${nq - start} of a $payloadLen-byte record")
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
    * ifcb_delivery_data_to_shark.R:241-243). Sidecar files group with
    * their main database by path (round-12): a `-wal` overlays its
    * committed frames, a `-shm` is ignored (runtime shared-memory
    * index; recovery never needs it), and a HOT `-journal` (valid
    * rollback-journal magic) rejects loudly — the main file may hold
    * pages of a transaction that crashed mid-write, and no committed
    * snapshot is reconstructable without applying the rollback.
    */
  def annotations(spark: SparkSession, dir: String,
                  table: String = "annotations"): DataFrame = {
    import spark.implicits._
    // exact sidecar set, not "*.db*": a wildcard tail would sweep in
    // manual.db.bak (silently unioning stale rows) or x.dbf (aborting
    // the read on a non-SQLite image) — round-12 review
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{db,db-wal,db-shm,db-journal}").load(dir)
      .select(col("path"), col("content"))
    val rows = files.as[(String, Array[Byte])]
      .groupByKey { case (p, _) => p.replaceAll("-(wal|shm|journal)$", "") }
      .flatMapGroups { (dbPath: String, it: Iterator[(String, Array[Byte])]) =>
        var main: Array[Byte] = null
        var wal: Option[Array[Byte]] = None
        var journal: Option[Array[Byte]] = None
        it.foreach { case (p, c) =>
          if (p.endsWith("-wal")) wal = Some(c)
          else if (p.endsWith("-journal")) journal = Some(c)
          else if (p.endsWith("-shm")) ()
          else main = c
        }
        require(main != null,
          s"orphan SQLite sidecar(s) for $dbPath: main database file missing")
        journal.foreach { j =>
          val hotMagic = Array(0xd9, 0xd5, 0x05, 0xf9, 0x20, 0xa1, 0x63, 0xd7)
            .map(_.toByte)
          require(j.length < 8 || !j.take(8).sameElements(hotMagic),
            s"hot rollback journal beside $dbPath: the main file may " +
              "contain uncommitted pages; recover the database with any " +
              "SQLite client before export")
        }
        val t = readTable(main, table, wal)
        val ci = t.columns.zipWithIndex.toMap
        // a MISSING column fails loudly like num() (round-15 review): a
        // renamed sample-name column otherwise read back all-null and
        // nulled every image_name join key with zero errors; a NULL
        // VALUE in a present column stays null (legitimately nullable)
        def str(r: Seq[Any], c: String): String = {
          val i = ci.getOrElse(c, throw new IllegalArgumentException(
            s"$dbPath: table '$table' has no column '$c'"))
          r(i) match { case null => null; case v => v.toString }
        }
        // loud, not getOrElse(0L): SQLite columns are dynamically
        // typed, so a NULL or text-stored roi_number would otherwise
        // emit roi 0 / image_name "<sample>_00000" — silently corrupt
        // join keys into the delivery (round-12 review). Text that IS
        // a number decodes (tools that bind everything as strings).
        def num(r: Seq[Any], c: String): Long = {
          val v = ci.get(c).map(r(_)).getOrElse(
            throw new IllegalArgumentException(
              s"$dbPath: table '$table' has no column '$c'"))
          v match {
            case l: Long => l
            case d: Double => d.toLong
            case s: String if s.matches("-?\\d+") => s.toLong
            case other =>
              throw new IllegalArgumentException(
                s"$dbPath: column '$c' holds non-numeric value " +
                  s"'$other' — cannot derive a ROI number")
          }
        }
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
