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

  test("WAL-mode database rejects loudly instead of silently reading stale rows") {
    // header bytes 18/19 (write/read file-format versions) are 2 in WAL
    // mode; the un-checkpointed -wal side file is invisible to this
    // reader, so proceeding would return stale data silently
    val wal = fixture.clone()
    wal(18) = 2; wal(19) = 2
    val e = intercept[IllegalArgumentException](
      SqliteSource.readTable(wal, "annotations"))
    assert(e.getMessage.contains("WAL"), e.getMessage)
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
}
