package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** SqliteSource against generated format-faithful fixtures. */
class SqliteSourceSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq(
    "sample_name" -> "TEXT", "roi_number" -> "INTEGER",
    "class_name" -> "TEXT", "annotator" -> "TEXT", "timestamp" -> "TEXT")

  private val rows: Seq[Seq[Any]] = Seq(
    Seq("D20230801T120000_IFCB134", 3L, "Mesodinium_rubrum", "alice", "2023-08-02 10:00:00"),
    Seq("D20230801T120000_IFCB134", 12L, "Dinophysis_acuminata", "bob", "2023-08-02 10:05:00"),
    Seq("D20230915T080000_IFCB134", 1L, "other", "alice", "2023-09-16 09:00:00"))

  private def fixture: Array[Byte] = SqliteFixture.write("annotations", cols, rows)

  test("readTable decodes schema and rows from the B-tree pages") {
    val t = SqliteSource.readTable(fixture, "annotations")
    assert(t.columns == cols.map(_._1))
    assert(t.rows.size == 3)
    assert(t.rows.head == Seq("D20230801T120000_IFCB134", 3L, "Mesodinium_rubrum",
      "alice", "2023-08-02 10:00:00"))
  }

  test("missing table is a loud error") {
    assertThrows[IllegalArgumentException] {
      SqliteSource.readTable(fixture, "nope")
    }
  }

  test("WAL-mode database with NO sidecar rejects loudly instead of reading stale rows") {
    // header bytes 18/19 (write/read file-format versions) are 2 in WAL
    // mode; without the -wal side file, un-checkpointed state is
    // invisible, so proceeding would return stale data silently
    val e = intercept[IllegalArgumentException](
      SqliteSource.readTable(SqliteFixture.toWalMode(fixture), "annotations"))
    assert(e.getMessage.contains("WAL"), e.getMessage)
  }

  // the round-12 WAL read path: v2 is the same deterministic fixture
  // layout with changed rows, so the "transaction" is exactly the pages
  // that differ (what real SQLite would have written to the wal)
  private def walTxn(from: Array[Byte], to: Array[Byte]): (Seq[(Int, Array[Byte])], Int) = {
    val p1 = SqliteFixture.pages(from)
    val p2 = SqliteFixture.pages(to)
    val changed = p2.toSeq.sortBy(_._1).filter { case (n, img) =>
      !p1.get(n).exists(_.sameElements(img))
    }
    (changed, p2.size)
  }

  test("WAL sidecar: un-checkpointed commits overlay the main file (db grows)") {
    val v1 = SqliteFixture.toWalMode(fixture) // 3 rows, 2 pages
    val rows2 = rows.updated(2,
      Seq("D20230915T080000_IFCB134", 1L, "Alexandrium_pseudogonyaulax",
        "carol", "2023-09-17 09:00:00")) :+
      Seq("D20231001T000000_IFCB134", 5L, "Tripos_muelleri", "dave", "2023-10-02 08:00:00")
    // 4 rows: the fixture grows to the interior-page layout (4 pages)
    val v2 = SqliteFixture.toWalMode(SqliteFixture.write("annotations", cols, rows2))
    val wal = SqliteFixture.writeWal(Seq(walTxn(v1, v2)))
    val t = SqliteSource.readTable(v1, "annotations", Some(wal))
    assert(t.rows.size == 4)
    assert(t.rows.map(_(2)).toSet ==
      Set("Mesodinium_rubrum", "Dinophysis_acuminata",
        "Alexandrium_pseudogonyaulax", "Tripos_muelleri"))
    assert(t.rows.map(_(3)).toSet == Set("alice", "bob", "carol", "dave"))
  }

  test("WAL recovery: committed prefix wins; torn and stale-salt tails are ignored") {
    val v1 = SqliteFixture.toWalMode(fixture)
    val rows2 = rows.updated(0,
      Seq("D20230801T120000_IFCB134", 3L, "Mesodinium_major", "alice", "2023-08-03 10:00:00"))
    val rows3 = rows2.updated(1,
      Seq("D20230801T120000_IFCB134", 12L, "Dinophysis_acuta", "bob", "2023-08-03 11:00:00"))
    val v2 = SqliteFixture.toWalMode(SqliteFixture.write("annotations", cols, rows2))
    val v3 = SqliteFixture.toWalMode(SqliteFixture.write("annotations", cols, rows3))
    val txn1 = walTxn(v1, v2)
    val txn2 = walTxn(v2, v3)
    // stale frames under a different salt after the real ones: the
    // previous generation of a reset wal, ignored by the salt check
    val stalePage = SqliteFixture.pages(v1)(2)
    val wal = SqliteFixture.writeWal(Seq(txn1, txn2), stale = Seq((2, stalePage)))
    val both = SqliteSource.readTable(v1, "annotations", Some(wal))
    assert(both.rows.map(_(2)).toSet ==
      Set("Mesodinium_major", "Dinophysis_acuta", "other"))
    // torn tail: corrupt one byte of txn2's first frame PAGE DATA — the
    // checksum chain breaks there, so txn2 (and everything after) is
    // dropped and the state is txn1's commit
    val clean = SqliteFixture.writeWal(Seq(txn1, txn2))
    val frameBytes = 24 + 4096
    val txn2FirstData = 32 + txn1._1.size * frameBytes + 24
    val torn = clean.clone()
    torn(txn2FirstData + 100) = (torn(txn2FirstData + 100) ^ 0x40).toByte
    val t1 = SqliteSource.readTable(v1, "annotations", Some(torn))
    assert(t1.rows.map(_(2)).toSet ==
      Set("Mesodinium_major", "Dinophysis_acuminata", "other"))
    // truncation mid-frame (a crash during the frame write): same story
    val cut = clean.take(txn2FirstData + 1000)
    val t2 = SqliteSource.readTable(v1, "annotations", Some(cut))
    assert(t2.rows.map(_(2)).toSet == t1.rows.map(_(2)).toSet)
  }

  test("WAL big-endian checksum words (magic 0x377f0683) decode identically") {
    // wal files from big-endian hosts carry the same frames with the
    // checksum computed over BE words; the reader selects word order
    // from the magic's low bit
    val v1 = SqliteFixture.toWalMode(fixture)
    val rows2 = rows :+ Seq("D20231001T000000_IFCB134", 5L, "Tripos_muelleri",
      "dave", "2023-10-02 08:00:00")
    val v2 = SqliteFixture.toWalMode(SqliteFixture.write("annotations", cols, rows2))
    val walBe = SqliteFixture.writeWal(Seq(walTxn(v1, v2)), bigWords = true)
    val t = SqliteSource.readTable(v1, "annotations", Some(walBe))
    assert(t.rows.size == 4)
    assert(t.rows.map(_(3)).toSet == Set("alice", "bob", "dave"))
  }

  test("WAL edge states: empty sidecar, uncommitted-only frames, bad header") {
    val v1 = SqliteFixture.toWalMode(fixture)
    // checkpoint(TRUNCATE) leaves a zero-length wal: main is complete
    assert(SqliteSource.readTable(v1, "annotations", Some(Array.empty[Byte]))
      .rows.size == 3)
    // frames present but NO commit frame (dbSize 0 throughout): a
    // transaction in flight — committed state is still the main file
    val rows2 = rows.updated(0,
      Seq("D20230801T120000_IFCB134", 3L, "changed", "alice", "2023-08-03"))
    val v2 = SqliteFixture.toWalMode(SqliteFixture.write("annotations", cols, rows2))
    val (changed, _) = walTxn(v1, v2)
    val uncommitted = SqliteFixture.writeWal(Seq((changed, 0)))
    val t = SqliteSource.readTable(v1, "annotations", Some(uncommitted))
    assert(t.rows.map(_(2)).toSet ==
      Set("Mesodinium_rubrum", "Dinophysis_acuminata", "other"))
    // a corrupted 32-byte header is indistinguishable from transit
    // damage: loud reject, never a silent no-frames read
    val wal = SqliteFixture.writeWal(Seq(walTxn(v1, v2)))
    val badMagic = wal.clone(); badMagic(0) = 0x00
    assertThrows[IllegalArgumentException](
      SqliteSource.readTable(v1, "annotations", Some(badMagic)))
    val badCk = wal.clone(); badCk(25) = (badCk(25) ^ 0x01).toByte
    assertThrows[IllegalArgumentException](
      SqliteSource.readTable(v1, "annotations", Some(badCk)))
  }

  test("golden: a REAL SQLite-written WAL pair decodes every committed row") {
    // fixtures written by SQLite 3.40 itself (python sqlite3, two
    // commits under wal_autocheckpoint=0, files copied while the
    // connection was open — the exact state a backup/export job sees).
    // The main file is ONE page: even the sqlite_master schema row
    // lives in the wal, so this exercises real salts, real cumulative
    // checksums, schema-page overlay and db growth end-to-end against
    // bytes this repo's own fixture writer never produced.
    def res(p: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(p)
      require(in != null, s"missing test resource $p")
      try in.readAllBytes() finally in.close()
    }
    val main = res("/sqlite_wal/manual.db")
    val wal = res("/sqlite_wal/manual.db-wal")
    assert(main.length == 4096 && (main(19) & 0xff) == 2)
    val t = SqliteSource.readTable(main, "annotations", Some(wal))
    assert(t.columns == Seq(
      "sample_name", "roi_number", "class_name", "annotator", "timestamp"))
    assert(t.rows.size == 5)
    assert(t.rows.map(r => (r(0), r(1), r(2))).toSet == Set(
      ("D20230801T120000_IFCB134", 3L, "Mesodinium_rubrum"),
      ("D20230801T120000_IFCB134", 12L, "Dinophysis_acuminata"),
      ("D20230915T080000_IFCB134", 1L, "other"),
      ("D20231001T000000_IFCB134", 5L, "Tripos_muelleri"),
      ("D20231001T000000_IFCB134", 9L, "Alexandrium_pseudogonyaulax")))
    // without the sidecar the same main file must reject loudly — the
    // whole table would otherwise silently vanish
    assertThrows[IllegalArgumentException](
      SqliteSource.readTable(main, "annotations"))
  }

  test("annotations view pairs -wal sidecars and rejects hot journals") {
    val dir = Files.createTempDirectory("sqlite_wal").toFile
    val v1 = SqliteFixture.toWalMode(fixture)
    val rows2 = rows :+ Seq("D20231001T000000_IFCB134", 5L, "Tripos_muelleri",
      "dave", "2023-10-02 08:00:00")
    val v2 = SqliteFixture.toWalMode(SqliteFixture.write("annotations", cols, rows2))
    Files.write(Paths.get(dir.toString, "manual.db"), v1)
    Files.write(Paths.get(dir.toString, "manual.db-wal"),
      SqliteFixture.writeWal(Seq(walTxn(v1, v2))))
    // -shm beside it is ignored (recovery never reads it)
    Files.write(Paths.get(dir.toString, "manual.db-shm"), new Array[Byte](32768))
    // a backup copy and a non-SQLite stray must BOTH be outside the
    // glob: "*.db*" would union the backup's stale rows silently and
    // abort on the stray (round-12 review)
    Files.write(Paths.get(dir.toString, "manual.db.bak"), fixture)
    Files.write(Paths.get(dir.toString, "notes.db.txt"),
      "not a database".getBytes("UTF-8"))
    val df = SqliteSource.annotations(spark, dir.toString)
    assert(df.count() == 4)
    assert(df.select("annotator").as[String].collect().toSet ==
      Set("alice", "bob", "dave"))
    // hot rollback journal: the main file may hold uncommitted pages
    val dir2 = Files.createTempDirectory("sqlite_hot").toFile
    Files.write(Paths.get(dir2.toString, "manual.db"), fixture)
    val hot = Array(0xd9, 0xd5, 0x05, 0xf9, 0x20, 0xa1, 0x63, 0xd7)
      .map(_.toByte) ++ new Array[Byte](504)
    Files.write(Paths.get(dir2.toString, "manual.db-journal"), hot)
    val e = intercept[Exception](
      SqliteSource.annotations(spark, dir2.toString).count())
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(chain.exists(_.contains("journal")), chain.mkString(" | "))
    // a COLD journal (zeroed header, journal_mode=PERSIST after commit)
    // is fine — reads the main file
    val dir3 = Files.createTempDirectory("sqlite_cold").toFile
    Files.write(Paths.get(dir3.toString, "manual.db"), fixture)
    Files.write(Paths.get(dir3.toString, "manual.db-journal"), new Array[Byte](512))
    assert(SqliteSource.annotations(spark, dir3.toString).count() == 3)
  }

  test("annotations view derives the reference's padded image_name") {
    val dir = Files.createTempDirectory("sqlite").toFile
    Files.write(Paths.get(dir.toString, "manual_annotations.db"), fixture)
    val df = SqliteSource.annotations(spark, dir.toString)
    assert(df.count() == 3)
    val img = df.filter($"roi_number" === 3)
      .select("image_name").as[String].collect().head
    assert(img == "D20230801T120000_IFCB134_00003")
    val classes = df.select("class_name").as[String].collect().toSet
    assert(classes == Set("Mesodinium_rubrum", "Dinophysis_acuminata", "other"))
  }

  test("annotations: text-stored roi numbers decode; null roi rejects loudly") {
    // SQLite columns are dynamically typed — a tool binding roi_number
    // as text must not silently emit roi 0 / image_name _00000
    // (round-12 review)
    val textRoi = SqliteFixture.write("annotations", cols, Seq(
      Seq("D20230801T120000_IFCB134", "42", "Mesodinium_rubrum", "alice", "t")))
    val d1 = Files.createTempDirectory("sqlite_textroi").toFile
    Files.write(Paths.get(d1.toString, "a.db"), textRoi)
    val ok = SqliteSource.annotations(spark, d1.toString).collect()
    assert(ok.length == 1 && ok.head.getAs[String]("image_name")
      == "D20230801T120000_IFCB134_00042")
    val nullRoi = SqliteFixture.write("annotations", cols, Seq(
      Seq("D20230801T120000_IFCB134", null, "Mesodinium_rubrum", "alice", "t")))
    val d2 = Files.createTempDirectory("sqlite_nullroi").toFile
    Files.write(Paths.get(d2.toString, "a.db"), nullRoi)
    val e = intercept[Exception](
      SqliteSource.annotations(spark, d2.toString).collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(chain.exists(_.contains("ROI number")), chain.mkString(" | "))
  }

  test("interior B-tree pages traverse in order (multi-page table)") {
    val manyRows: Seq[Seq[Any]] = (1 to 6).map(i =>
      Seq(s"D2023080${i}T000000_IFCB134", i.toLong, s"class_$i", "alice", "2023-08-10"))
    val t = SqliteSource.readTable(
      SqliteFixture.write("annotations", cols, manyRows), "annotations")
    assert(t.rows.size == 6)
    assert(t.rows.map(_(1)) == (1 to 6).map(_.toLong))
  }

  test("round-trips every integer serial-type width, doubles, unicode, nulls") {
    val wideCols = Seq("s" -> "TEXT", "v" -> "INTEGER", "d" -> "REAL", "n" -> "TEXT")
    val tricky: Seq[Seq[Any]] = Seq(
      Seq("plain", 7L, 1.5, null),                         // int8
      Seq("Tångesund_µm", -300L, -0.0, "x"),               // int16, unicode
      Seq("", 100000L, Double.MaxValue, null),             // int24, empty str
      Seq("q''uote", -2000000000L, 4.9e-324, "y"),         // int32
      Seq("tab\tsep", 1L << 40, Double.NaN, null),         // int48
      Seq("big", Long.MinValue + 1, 0.0, "z"))             // int64
    val t = SqliteSource.readTable(
      SqliteFixture.write("annotations", wideCols, tricky), "annotations")
    assert(t.rows.size == tricky.size)
    for ((got, want) <- t.rows.zip(tricky); (g, w) <- got.zip(want)) (g, w) match {
      case (gd: Double, wd: Double) if wd.isNaN => assert(gd.isNaN)
      case _ => assert(g == w, s"$g != $w")
    }
  }

  test("overflow chain round-trips a class_name longer than a page (round-11)") {
    // a real annotations DB with a long comment/class_name string spills
    // past the leaf max-local threshold onto chained overflow pages
    // (reference consumption: code/ifcb_delivery_data_to_shark.R:236-243)
    val long1 = ("Dinophysis_acuminata_" * 300).take(5800)  // ~1.4 pages
    val long2 = ("x" * 9500)                                // 3-page chain
    val spillRows: Seq[Seq[Any]] = Seq(
      Seq("D20230801T120000_IFCB134", 3L, long1, "alice", "2023-08-02 10:00:00"),
      Seq("D20230801T120000_IFCB134", 4L, long2, "bob", "2023-08-02 10:05:00"),
      Seq("D20230915T080000_IFCB134", 1L, "short", "alice", "2023-09-16 09:00:00"))
    val t = SqliteSource.readTable(
      SqliteFixture.write("annotations", cols, spillRows), "annotations")
    assert(t.rows.size == 3)
    assert(t.rows(0)(2) == long1)
    assert(t.rows(1)(2) == long2)
    assert(t.rows(2)(2) == "short")
    // and through the Spark annotations view
    val dir = Files.createTempDirectory("sqliteovf").toFile
    Files.write(Paths.get(dir.toString, "manual_annotations.db"),
      SqliteFixture.write("annotations", cols, spillRows))
    val df = SqliteSource.annotations(spark, dir.toString)
    val got = df.filter($"roi_number" === 4)
      .select("class_name").as[String].collect().head
    assert(got == long2)
  }

  test("parseColumns handles quoting and constraint clauses") {
    assert(SqliteSource.parseColumns(
      "CREATE TABLE t (a TEXT, \"b c\" INTEGER, d REAL, PRIMARY KEY (a))")
      == Seq("a", "b c", "d"))
  }

  test("parseColumns ignores commas inside type and constraint parens") {
    assert(SqliteSource.parseColumns(
      "CREATE TABLE t (a TEXT, conf DECIMAL(10,2), n INTEGER, CHECK(n IN (1,2)))")
      == Seq("a", "conf", "n"))
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t (a TEXT, n INTEGER PRIMARY KEY)").contains(1))
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t (a TEXT, n INTEGER)").isEmpty)
    // table-level single-column constraint form (round-15 review):
    // SQLite treats it as a rowid alias too and stores NULL in the
    // record — missing it read the key column back all-null
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t (n INTEGER, a TEXT, PRIMARY KEY(n))").contains(0))
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t (n INTEGER, a TEXT, PRIMARY KEY(n ASC))").contains(0))
    // round-16 advice: per the SQLite spec the table-level DESC form IS
    // an alias; the sole non-alias exception is the INLINE `INTEGER
    // PRIMARY KEY DESC` declaration — the previous round had them
    // inverted, nulling PRIMARY KEY(col DESC) tables' keys silently
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t (n INTEGER, a TEXT, PRIMARY KEY(n DESC))").contains(0))
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t (a TEXT, n INTEGER PRIMARY KEY DESC)").isEmpty)
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t (a TEXT, n INTEGER PRIMARY KEY ASC)").contains(1))
    // quoted identifiers in both the constraint and the definition
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t (\"n\" INTEGER, a TEXT, PRIMARY KEY(\"n\"))").contains(0))
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t ([n] INTEGER, a TEXT, PRIMARY KEY(`n` DESC))").contains(0))
    // composite keys are never aliases
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t (n INTEGER, a TEXT, PRIMARY KEY(n, a))").isEmpty)
    // a TEXT-typed constraint key is not an alias either
    assert(SqliteSource.rowidAliasIndex(
      "CREATE TABLE t (n TEXT, a TEXT, PRIMARY KEY(n))").isEmpty)
  }

  test("INTEGER PRIMARY KEY rowid alias reads back from the cell rowid") {
    // SQLite stores NULL in the record for a rowid-alias column; the
    // value lives in the cell's rowid varint
    val cols = Seq("roi_number" -> "INTEGER PRIMARY KEY", "class_name" -> "TEXT")
    val rows = Seq(Seq(null, "Mesodinium"), Seq(null, "Dinophysis"))
    val t = SqliteSource.readTable(
      SqliteFixture.write("annotations", cols, rows), "annotations")
    assert(t.columns == Seq("roi_number", "class_name"))
    assert(t.rows.map(_.head) == Seq(1L, 2L))
    assert(t.rows.map(_(1)) == Seq("Mesodinium", "Dinophysis"))
  }

  test("table-level PRIMARY KEY(col DESC) rowid alias reads back from the cell rowid (round-16)") {
    // the DESC constraint form is STILL a rowid alias per the spec —
    // the record stores NULL and the key lives in the rowid varint, so
    // the pre-fix parser read these tables' keys back all-null
    val cols = Seq("roi_number" -> "INTEGER", "class_name" -> "TEXT",
      "PRIMARY KEY(roi_number DESC)" -> "")
    val rows = Seq(Seq(null, "Mesodinium"), Seq(null, "Dinophysis"))
    val t = SqliteSource.readTable(
      SqliteFixture.write("annotations", cols, rows), "annotations")
    assert(t.columns == Seq("roi_number", "class_name"))
    assert(t.rows.map(_.head) == Seq(1L, 2L))
    assert(t.rows.map(_(1)) == Seq("Mesodinium", "Dinophysis"))
  }
}
