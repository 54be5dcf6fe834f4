package graft.sources

import java.sql.Timestamp
import graft.SparkSpec

/** K5 chart renders — the last reference plot scripts (plot_PACE.R,
  * plots-poster.R, compare_microscopy.R's scatter facets).
  */
class ChartsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stackedAreaChartSvg stacks groups per facet, clips at yMax, skips empty bands") {
    val series = Seq(
      ("C1", ts("2024-05-01 06:00:00"), "Dinophyceae", 10.0),
      ("C1", ts("2024-05-01 06:00:00"), "Cyanophyceae", 5.0),
      ("C1", ts("2024-05-02 06:00:00"), "Dinophyceae", 90.0), // clipped sum
      ("C1", ts("2024-05-02 06:00:00"), "Cyanophyceae", 20.0),
      ("C2", ts("2024-06-10 06:00:00"), "Dinophyceae", 3.0),
      ("C2", ts("2024-06-11 06:00:00"), "Dinophyceae", 4.0))
      .toDF("cruise", "datetime", "plankton_group", "biomass")
    val svg = Charts.stackedAreaChartSvg(series, "cruise", "datetime",
      "plankton_group", "biomass", yMax = 70.0)
    // one panel per cruise, facet titles bold
    assert(svg.contains(">C1</text>") && svg.contains(">C2</text>"))
    // C1 has both groups (two bands), C2 only one: three polygons total
    val polys = "<polygon ".r.findAllIn(svg).length
    assert(polys == 3, s"expected 3 area bands, got $polys")
    // Set2 palette in sorted-group order: Cyanophyceae first
    assert(svg.indexOf("#66c2a5") < svg.indexOf("#fc8d62"))
    assert(svg.contains("<title>Cyanophyceae</title>") &&
      svg.contains("<title>Dinophyceae</title>"))
    // coord_cartesian clip: no y coordinate above the panel top
    // (all py values within [pad, pad+panelH] for the first panel row)
    val ys = """points="([^"]+)"""".r.findAllMatchIn(svg)
      .flatMap(_.group(1).split(" ").map(_.split(",")(1).toDouble)).toSeq
    assert(ys.forall(y => y >= 27.9), s"band escaped the panel: ${ys.min}")
    // golden stability
    assert(svg == Charts.stackedAreaChartSvg(series, "cruise", "datetime",
      "plankton_group", "biomass", yMax = 70.0))
  }

  test("stackedAreaChartSvg default yMax shares one y-scale across facets") {
    // free_x frees only x: C2 (max 4) must render small against C1 (110)
    val series = Seq(
      ("C1", ts("2024-05-01 06:00:00"), "Dinophyceae", 110.0),
      ("C1", ts("2024-05-02 06:00:00"), "Dinophyceae", 50.0),
      ("C2", ts("2024-06-10 06:00:00"), "Dinophyceae", 3.0),
      ("C2", ts("2024-06-11 06:00:00"), "Dinophyceae", 4.0))
      .toDF("cruise", "datetime", "plankton_group", "biomass")
    val svg = Charts.stackedAreaChartSvg(series, "cruise", "datetime",
      "plankton_group", "biomass")
    val polys = """points="([^"]+)"""".r.findAllMatchIn(svg)
      .map(_.group(1)).toSeq
    assert(polys.length == 2)
    // C2's band top (min y of its polygon) sits in the bottom tenth of
    // its panel: 4/110 of panelH=240 above the baseline y0+240, y0=28
    val c2top = polys.last.split(" ").map(_.split(",")(1).toDouble).min
    assert(c2top > 28 + 240 - 24, s"C2 band drew at shared scale? top=$c2top")
  }

  test("barChartSvg orders largest bar on top with black outline and 5% headroom") {
    val counts = Seq(("Dinophyceae", 40L), ("Bacillariophyceae", 100L),
      ("Cyanophyceae", 40L)).toDF("class", "count")
    val svg = Charts.barChartSvg(counts, "class", "count")
    // largest first; 40-count tie broken by label
    val bac = svg.indexOf(">Bacillariophyceae</text>")
    val cya = svg.indexOf(">Cyanophyceae</text>")
    val din = svg.indexOf(">Dinophyceae</text>")
    assert(bac >= 0 && bac < cya && cya < din)
    assert(svg.contains("stroke=\"black\""))
    // 5% headroom: max bar fills 1/1.05 of the value span
    val widths = """<rect [^>]*width="([0-9.]+)"""".r
      .findAllMatchIn(svg).map(_.group(1).toDouble).toSeq
    assert(math.abs(widths.max - (640 - 180 - 20) / 1.05) < 0.01)
    assert(svg.contains("<title>100</title>"))
    assert(svg == Charts.barChartSvg(counts, "class", "count"))
  }

  test("scatterFacetSvg renders free-scaled panels with diagonal and drops nulls") {
    val pairs = Seq(
      ("Aphanizomenon", Some(1.0), Some(2.0)),
      ("Aphanizomenon", Some(4.0), Some(3.0)),
      ("Nodularia spumigena", Some(100.0), Some(150.0)),
      ("Nodularia spumigena", None, Some(1.0))) // na.rm
      .map { case (t, x, y) => (t, x.map(Double.box).orNull, y.map(Double.box).orNull) }
      .toDF("taxon", "microscopy", "ifcb")
    val svg = Charts.scatterFacetSvg(pairs, "taxon", "microscopy", "ifcb")
    val circles = "<circle ".r.findAllIn(svg).length
    assert(circles == 3, s"null row must drop: got $circles points")
    assert(svg.contains("#00008b") && svg.contains("fill-opacity=\"0.7\""))
    // overlapping-range panel draws the y = x diagonal
    assert(svg.contains("stroke-dasharray=\"4 3\""))
    assert(svg.contains(">Aphanizomenon</text>") &&
      svg.contains(">Nodularia spumigena</text>"))
    assert(svg == Charts.scatterFacetSvg(pairs, "taxon", "microscopy", "ifcb"))
  }

  test("null labels/facets drop like na.rm instead of throwing") {
    // barChartSvg: null label with a non-null count must not reach
    // escape(null)
    val counts = Seq((Option("Dinophyceae"), 40L), (None, 10L))
      .map { case (l, c) => (l.orNull, c) }.toDF("class", "count")
    val svg = Charts.barChartSvg(counts, "class", "count")
    assert("<rect ".r.findAllIn(svg).length == 1)
    assert(svg.contains(">Dinophyceae</text>"))
    // scatterFacetSvg: null facet with non-null coordinates likewise
    val pairs = Seq((Option("Aphanizomenon"), 1.0, 2.0), (None, 3.0, 4.0))
      .map { case (t, x, y) => (t.orNull, x, y) }.toDF("taxon", "x", "y")
    val fsvg = Charts.scatterFacetSvg(pairs, "taxon", "x", "y")
    assert("<circle ".r.findAllIn(fsvg).length == 1)
  }
}
