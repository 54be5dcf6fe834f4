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
}
