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

  test("parseColumns handles quoting and constraint clauses") {
    assert(SqliteSource.parseColumns(
      "CREATE TABLE t (a TEXT, \"b c\" INTEGER, d REAL, PRIMARY KEY (a))")
      == Seq("a", "b c", "d"))
  }
}
