package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkSpec

/** K5/K6 sinks and the S8/S9 WoRMS snapshot tooling. */
class ReportsSpec extends SparkSpec {
  import spark.implicits._

  test("flagSummaryHtml aggregates and renders descending counts") {
    val flags = Seq("bubbles", "beads", "bubbles", "low_count", "bubbles", "beads")
      .toDF("flag")
    val html = Reports.flagSummaryHtml(flags, "flag", "PSD Summary for Year 2023 (total n samples: 6)")
    assert(html.contains("<caption>PSD Summary for Year 2023 (total n samples: 6)</caption>"))
    assert(html.contains("<th>Q-flag</th><th>Number of samples</th>"))
    val bubbleIdx = html.indexOf("<td>bubbles</td><td>3</td>")
    val beadsIdx = html.indexOf("<td>beads</td><td>2</td>")
    val lowIdx = html.indexOf("<td>low_count</td><td>1</td>")
    assert(bubbleIdx >= 0 && beadsIdx > bubbleIdx && lowIdx > beadsIdx)
  }

  test("htmlSummary escapes markup in values") {
    val df = Seq(("<script>", 1L)).toDF("name", "n")
    val html = Reports.htmlSummary(df, "a & b")
    assert(html.contains("&lt;script&gt;") && html.contains("a &amp; b"))
  }

  test("deliveryNote renders key-value lines, bare key for empty values") {
    val note = Reports.deliveryNote(Seq(
      "provtagningsår" -> "2022-2023",
      "datatyp" -> "Plankton Imaging",
      "kommentarer" -> "",
      "status" -> "test"))
    assert(note ==
      "provtagningsår: 2022-2023\ndatatyp: Plankton Imaging\nkommentarer:\nstatus: test\n")
    val dir = Files.createTempDirectory("note")
    Reports.writeText(dir.resolve("sub/delivery_note.txt").toString, note)
    assert(Files.readString(dir.resolve("sub/delivery_note.txt")) == note)
  }

  test("qcMapHtml renders one monthly SVG with color-coded flag markers and popups") {
    val samples = Seq(
      ("S1", 57.5, 11.8, "2023-01-10", null.asInstanceOf[String]),
      ("S2", 57.6, 11.9, "2023-01-20", "Bubbles"),
      ("S3", 58.0, 11.0, "2023-03-05", null.asInstanceOf[String]))
      .toDF("sample", "lat", "lon", "date", "flag")
    val html = Maps.qcMapHtml(samples, "sample", "lat", "lon", "date", "flag")
    // months with samples render in order; February (no samples) is skipped
    val jan = html.indexOf("<h3>January 2023</h3>")
    val mar = html.indexOf("<h3>March 2023</h3>")
    assert(jan >= 0 && mar > jan && !html.contains("February"))
    // blue = unflagged with bare popup, red = flagged with QFlag popup
    assert(html.contains("fill=\"#2a81cb\"><title>Sample: S1</title>"))
    assert(html.contains("fill=\"#cb2b3e\"><title>Sample: S2 QFlag: Bubbles</title>"))
    assert(html.split("<svg ").length == 3) // exactly two maps
    // golden stability: same input → byte-identical output
    assert(html == Maps.qcMapHtml(samples, "sample", "lat", "lon", "date", "flag"))
  }

  test("frequencyMapSvg bins distributed, ramps plasma, draws basins beneath") {
    // 3 points in one 0.3x0.25 cell, 1 in another: two rects, max freq 3
    val pts = Seq((57.51, 11.81), (57.52, 11.82), (57.53, 11.83), (60.0, 15.0))
      .toDF("lat", "lon")
    val basin = ShapefileSource.Ring(1, 0,
      Seq((11.0, 57.0), (16.0, 57.0), (16.0, 61.0), (11.0, 61.0), (11.0, 57.0)))
    val svg = Maps.frequencyMapSvg(pts, "lat", "lon", basins = Seq(basin))
    val rects = "<rect ".r.findAllIn(svg).length
    assert(rects == 2, s"expected 2 occupied cells, got $rects\n$svg")
    assert(svg.contains("<title>3</title>") && svg.contains("<title>1</title>"))
    // hottest cell carries the plasma top anchor, coolest the bottom
    assert(svg.contains("fill=\"#f0f921\"") && svg.contains("fill=\"#0d0887\""))
    // land polygon renders before (beneath) the cells, reference land color
    val poly = svg.indexOf("polygon points=")
    assert(poly >= 0 && poly < svg.indexOf("<rect ") &&
      svg.contains("fill=\"#eeeac4\""))
    assert(svg == Maps.frequencyMapSvg(pts, "lat", "lon", basins = Seq(basin)))
  }

  test("distributionMapsHtml facets per cruise/taxon, masks land, global zlim") {
    val obs = Seq(
      ("2023_011", "Aphanizomenon", 57.2, 14.2, 10.0, "2023-06-15"),
      ("2023_011", "Aphanizomenon", 57.8, 15.8, 2.0, "2023-06-16"),
      ("2023_011", "Nodularia spumigena", 57.5, 15.0, 5.0, "2023-06-15"),
      ("2024_013", "Aphanizomenon", 57.4, 14.5, 8.0, "2024-07-02"))
      .toDF("cruise", "taxon", "lat", "lon", "conc", "date")
    val grid = Maps.GridSpec(14.0, 16.0, 5, 57.0, 58.0, 5, len = 0.5)
    def render(basins: Seq[ShapefileSource.Ring]) =
      Maps.distributionMapsHtml(obs, "cruise", "taxon", "lat", "lon",
        "conc", "date", grid, basins)
    val html = render(Nil)
    // one header per cruise in order, reference title form with month names
    val c1 = html.indexOf("<h3>Biomass, cruise: 2023_011, month(s): June</h3>")
    val c2 = html.indexOf("<h3>Biomass, cruise: 2024_013, month(s): July</h3>")
    assert(c1 >= 0 && c2 > c1, html.take(400))
    // 2 taxa on the first cruise + 1 on the second = 3 facet SVGs,
    // each captioned with its taxon
    assert(html.split("<svg ").length == 4)
    assert(html.contains(">Aphanizomenon</text>") &&
      html.contains(">Nodularia spumigena</text>"))
    // global color limits: the ramp's two end anchors both appear
    assert(html.contains("fill=\"#042482\"") && html.contains("fill=\"#8a0d1c\""))
    // stations render as translucent white markers
    assert(html.contains("fill=\"white\" fill-opacity=\"0.5\""))
    // full sea grid: every facet renders all 25 cells
    assert("<rect ".r.findAllIn(html).length == 3 * 25)
    // a land ring over the NE corner masks cells AND draws on top of them
    val ring = ShapefileSource.Ring(1, 0,
      Seq((15.4, 57.6), (16.1, 57.6), (16.1, 58.1), (15.4, 58.1), (15.4, 57.6)))
    val masked = render(Seq(ring))
    assert("<rect ".r.findAllIn(masked).length < 3 * 25)
    val svg1 = masked.substring(masked.indexOf("<svg "), masked.indexOf("</svg>"))
    assert(svg1.indexOf("<polygon ") > svg1.lastIndexOf("<rect "),
      "land must draw after (on top of) the raster")
    // byte determinism
    assert(html == render(Nil) && masked == render(Seq(ring)))
  }

  test("summerCyanoMapsHtml filters taxa and June-August, cyano title") {
    val obs = Seq(
      ("2024_016", "Nodularia spumigena", 57.3, 14.3, 4.0, "2024-07-10"),
      ("2024_016", "Dolichospermum", 57.6, 15.6, 1.0, "2024-07-11"),
      ("2024_016", "Mesodinium rubrum", 57.5, 15.0, 9.0, "2024-07-10"), // not cyano
      ("2024_016", "Nodularia spumigena", 57.5, 15.1, 7.0, "2024-05-01")) // May
      .toDF("cruise", "taxon", "lat", "lon", "conc", "date")
    val grid = Maps.GridSpec(14.0, 16.0, 3, 57.0, 58.0, 3, len = 0.75)
    val html = Maps.summerCyanoMapsHtml(obs, "cruise", "taxon", "lat", "lon",
      "conc", "date", grid = grid)
    assert(html.contains(
      "<h3>Cyanobacterial biomass, cruise: 2024_016, month(s): July</h3>"))
    assert(html.split("<svg ").length == 3) // only the two cyano taxa
    assert(!html.contains("Mesodinium"))
    // the May observation is excluded: only the two July stations remain
    assert("fill=\"white\"".r.findAllIn(html).length == 2 * 2) // 2 stations × 2 facets
    assert(html == Maps.summerCyanoMapsHtml(obs, "cruise", "taxon", "lat",
      "lon", "conc", "date", grid = grid))
  }

  test("plasma ramp endpoints and midpoint are the anchor colors") {
    assert(Maps.plasma(0.0) == "#0d0887")
    assert(Maps.plasma(0.5) == "#cc4778")
    assert(Maps.plasma(1.0) == "#f0f921")
    assert(Maps.plasma(-1.0) == "#0d0887" && Maps.plasma(2.0) == "#f0f921")
  }

  test("worms request urls batch deterministically and encode names") {
    val urls = WormsSnapshot.requestUrls(
      Seq("Mesodinium rubrum", "Dinophysis acuta", "Mesodinium rubrum"), batchSize = 1)
    assert(urls.size == 2) // deduped, sorted
    assert(urls.head.contains("scientificnames%5B%5D=Dinophysis+acuta".replace("%5B%5D=", "[]=")))
    assert(urls.forall(_.startsWith(WormsSnapshot.MatchEndpoint)))
  }

  test("worms responses parse to the broadcastable dim") {
    val dir = Files.createTempDirectory("worms")
    val response =
      """[
        |  [{"AphiaID": 232069, "scientificname": "Mesodinium rubrum",
        |    "status": "accepted", "rank": "Species", "kingdom": "Chromista",
        |    "phylum": "Ciliophora", "class": "Litostomatea",
        |    "order": "Cyclotrichiida", "family": "Mesodiniidae",
        |    "genus": "Mesodinium"},
        |   {"AphiaID": 999999, "scientificname": "Mesodinium rubrum dup",
        |    "status": "unaccepted", "rank": "Species", "kingdom": "Chromista",
        |    "phylum": "Ciliophora", "class": "Litostomatea",
        |    "order": "Cyclotrichiida", "family": "Mesodiniidae",
        |    "genus": "Mesodinium"}],
        |  []
        |]""".stripMargin
    Files.writeString(dir.resolve("batch_0.json"), response)
    val dim = WormsSnapshot.parseResponses(spark, dir.toString)
    val rows = dim.collect()
    assert(rows.length == 1) // first candidate wins; empty batch dropped
    val r = rows.head
    assert(r.getAs[Long]("aphia_id") == 232069L)
    assert(r.getAs[String]("worms_genus") == "Mesodinium")
    // snapshot write round-trips
    val out = Files.createTempDirectory("wormsout").resolve("dim").toString
    WormsSnapshot.writeSnapshot(spark, dir.toString, out)
    assert(spark.read.parquet(out).count() == 1)
  }

  test("pointsMapSvg distincts positions, sea beneath land beneath red markers") {
    val pts = Seq[(java.lang.Double, java.lang.Double)](
      (57.5, 11.8), (57.5, 11.8), (58.0, 12.0), // dup collapses
      (null, 11.0)) // null position drops
      .toDF("lat", "lon")
    val basin = ShapefileSource.Ring(1, 0,
      Seq((11.0, 57.0), (13.0, 57.0), (13.0, 59.0), (11.0, 59.0), (11.0, 57.0)))
    val svg = Maps.pointsMapSvg(pts, "lat", "lon", basins = Seq(basin))
    val circles = "<circle ".r.findAllIn(svg).length
    assert(circles == 2, s"distinct + null-drop should leave 2 markers, got $circles")
    // layering: sea rect, then land polygon, then markers
    val sea = svg.indexOf("fill=\"lightblue\"")
    val land = svg.indexOf("fill=\"#eeeac4\"")
    val marker = svg.indexOf("fill=\"#d62728\"")
    assert(sea >= 0 && sea < land && land < marker)
    assert(svg == Maps.pointsMapSvg(pts, "lat", "lon", basins = Seq(basin)))
  }

  test("comparisonMapsHtml facets taxon rows by (month, type), sizes globally") {
    val pairs = Seq(
      ("Aphanizomenon", 6, "IFCB", "Surface", 57.5, 11.8, 10.0),
      ("Aphanizomenon", 6, "Microscopy", "Integrated 0-10 or 0-20 m", 57.5, 11.8, 40.0),
      ("Aphanizomenon", 7, "IFCB", "Surface", 58.0, 12.0, 25.0),
      ("Nodularia spumigena", 6, "IFCB", "Surface", 57.5, 11.8, 40.0))
      .toDF("taxon", "month", "sample_type", "depth", "lat", "lon", "carbon")
    val html = Maps.comparisonMapsHtml(pairs, "taxon", "month",
      "sample_type", "depth", "lat", "lon", "carbon")
    // italic taxon headers in sorted order
    val aph = html.indexOf("<h3><i>Aphanizomenon</i></h3>")
    val nod = html.indexOf("<h3><i>Nodularia spumigena</i></h3>")
    assert(aph >= 0 && nod > aph)
    // 2 taxa x 3 (month, type) columns = 6 panels
    assert(html.split("<svg ").length == 7)
    assert(html.contains("June · IFCB") && html.contains("June · Microscopy") &&
      html.contains("July · IFCB"))
    // global size scale: min value 10 -> r=6, max 40 -> r=20, 25 -> r=13
    assert(html.contains("r=\"6.00\"") && html.contains("r=\"20.00\"") &&
      html.contains("r=\"13.00\""))
    // type fill + depth stroke colors
    assert(html.contains("fill=\"#1f77b4\"") && html.contains("fill=\"#ff7f0e\""))
    assert(html.contains("stroke=\"#d62728\"") && html.contains("stroke=\"#2ca02c\""))
    assert(html == Maps.comparisonMapsHtml(pairs, "taxon", "month",
      "sample_type", "depth", "lat", "lon", "carbon"))
  }

  test("gaussianField matches the hand-computed 2x2 golden (DIVA numeric core)") {
    // 3 stations, 2x2 grid, len = 1 (so 2·len² = 2). Station layout is
    // deliberately asymmetric — s2 sits one degree EAST (lon), s3 one
    // degree NORTH (lat), with different values — so a lat/lon axis swap
    // in the kernel shifts every expected number.
    //   s1 = (lat 0, lon 0, f 10)
    //   s2 = (lat 0, lon 1, f 20)
    //   s3 = (lat 1, lon 0, f 30)
    val pts = Seq((0.0, 0.0, 10.0), (0.0, 1.0, 20.0), (1.0, 0.0, 30.0))
    val lons = IndexedSeq(0.0, 1.0)
    val lats = IndexedSeq(0.0, 1.0)
    val field = Maps.gaussianField(pts, lons, lats, len = 1.0, sea = (_, _) => true)
    // hand derivation: w(d²) = exp(-d²/2); a = w(1) = e^-½, b = w(2) = e^-1
    val a = math.exp(-0.5)
    val b = math.exp(-1.0)
    // node (lon 0, lat 0): d² = 0 to s1, 1 to s2, 1 to s3
    val g00 = (10.0 + 20.0 * a + 30.0 * a) / (1.0 + 2.0 * a)
    // node (lon 1, lat 0): d² = 1 to s1, 0 to s2, 2 to s3
    val g10 = (10.0 * a + 20.0 + 30.0 * b) / (a + 1.0 + b)
    // node (lon 0, lat 1): d² = 1 to s1, 2 to s2, 0 to s3
    val g01 = (10.0 * a + 20.0 * b + 30.0) / (a + b + 1.0)
    // node (lon 1, lat 1): d² = 2 to s1, 1 to s2, 1 to s3
    val g11 = (10.0 * b + 20.0 * a + 30.0 * a) / (b + 2.0 * a)
    // absolute literals too (recomputed independently), so the test
    // cannot drift in lockstep with a kernel change
    assert(math.abs(g00 - 18.2220585718) < 1e-9)
    assert(math.abs(g10 - 18.7912783751) < 1e-9)
    assert(math.abs(g01 - 21.9928450534) < 1e-9)
    assert(math.abs(g11 - 21.5095519357) < 1e-9)
    assert(math.abs(field(0)(0) - g00) < 1e-12, s"(0,0): ${field(0)(0)}")
    assert(math.abs(field(1)(0) - g10) < 1e-12, s"(1,0): ${field(1)(0)}")
    assert(math.abs(field(0)(1) - g01) < 1e-12, s"(0,1): ${field(0)(1)}")
    assert(math.abs(field(1)(1) - g11) < 1e-12, s"(1,1): ${field(1)(1)}")
    // asymmetry check made explicit: east-of-s2 node != north-of-s3 node
    assert(field(1)(0) != field(0)(1))
    // a masked node is NaN regardless of stations
    val masked = Maps.gaussianField(pts, lons, lats, 1.0,
      sea = (i, j) => !(i == 1 && j == 1))
    assert(masked(1)(1).isNaN && !masked(0)(0).isNaN)
  }
}
