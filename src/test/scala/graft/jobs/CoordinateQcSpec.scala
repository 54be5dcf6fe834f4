package graft.jobs

import graft.SparkSpec

/** Coordinate QC: near-land distance test, basin assignment, flag union. */
class CoordinateQcSpec extends SparkSpec {
  import spark.implicits._

  // "coastline": a square landmass lat 10..11, lon 10..11
  private val coast = Seq((10.0, 10.0), (11.0, 10.0), (11.0, 11.0), (10.0, 11.0), (10.0, 10.0))
  // one basin south of it
  private val basins = Seq(
    "South Basin" -> Seq((8.0, 9.0), (9.9, 9.0), (9.9, 12.0), (8.0, 12.0), (8.0, 9.0)))

  private val positions = Seq(
    ("S1", Option(10.5), 10.5),    // on land (inside coast polygon)
    ("S2", Option(10.5), 11.003),  // ~330 m east of the coast edge → near land
    ("S3", Option(9.0), 10.0),     // far offshore, inside South Basin
    ("S4", Option(20.0), 20.0),    // far from everything
    ("S5", Option.empty[Double], 5.0) // dropped: null lat
  ).toDF("sample", "lat", "lon")

  test("checkCoordinates flags near-land within distance and assigns basins") {
    val checked = CoordinateQc.checkCoordinates(positions, coast, basins)
    val rows = checked.select("sample", "near_land", "in_basin", "basin")
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getString(3)))).toMap
    assert(rows.size == 4) // S5 dropped
    assert(rows("S1") == ((true, false, null)))  // inside coast
    assert(rows("S2")._1)                        // within 500 m
    assert(rows("S3") == ((false, true, "South Basin")))
    assert(rows("S4") == ((false, false, null)))
  }

  test("qcFlags unites PSD and near-land flags in sentence case") {
    val checked = CoordinateQc.checkCoordinates(positions, coast, basins)
    val psd = Seq(("S2", "low counts"), ("S3", "bubbles")).toDF("sample", "flag")
    val q = CoordinateQc.qcFlags(psd, checked)
      .collect().map(r => r.getAs[String]("sample") ->
        ((r.getAs[String]("flag"), r.getAs[String]("group")))).toMap
    assert(q("S2") == (("Low counts, near land", "red")))
    assert(q("S3") == (("Bubbles", "red")))
    assert(q("S1") == (("Near land", "red"))) // no PSD flag, on land
    assert(q("S4") == ((null, "blue")))
  }

  test("the 'ok' PSD sentinel is NOT a QC flag: healthy offshore samples stay blue") {
    // round-14 review: IngestQc.psd emits flag='ok' for unflagged
    // samples (kept for q88 oracle parity); treating it as a real flag
    // painted every healthy sample red with a bogus 'Ok' label — the
    // reference uses NA for unflagged (Rmd:757-765)
    val checked = CoordinateQc.checkCoordinates(positions, coast, basins)
    val psd = Seq(("S4", "ok"), ("S1", "ok"), ("S3", "bubbles"))
      .toDF("sample", "flag")
    val q = CoordinateQc.qcFlags(psd, checked)
      .collect().map(r => r.getAs[String]("sample") ->
        ((r.getAs[String]("flag"), r.getAs[String]("group")))).toMap
    assert(q("S4") == ((null, "blue")), q("S4")) // ok + offshore = blue
    assert(q("S1") == (("Near land", "red"))) // ok + near land = just Near land
    assert(q("S3") == (("Bubbles", "red"))) // real flags unaffected
  }
}
