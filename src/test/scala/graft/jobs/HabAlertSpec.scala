package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Daily HAB alert composition (ifcb_hab_alert.R:21-299): rollup → HAB
  * join → per-taxon max sample → bloom bands → alert subject + HTML.
  */
class HabAlertSpec extends SparkSpec {
  import spark.implicits._

  // two samples; Alexandrium (HAB, warning 1000/L) peaks in S2; the
  // cyano Nodularia has no warning level; Ditylum is not a HAB taxon
  private val roi = Seq(
    ("S1", "Alexandrium_spp", 4000.0, false),
    ("S2", "Alexandrium_spp", 4000.0, false),
    ("S2", "Alexandrium_spp", 4100.0, false),
    ("S1", "Nodularia_spumigena", 900.0, false),
    ("S1", "Ditylum_brightwellii", 80000.0, true),
    ("S2", "Ditylum_brightwellii", 90000.0, true)
  ).toDF("sample", "class_name", "vol_um3", "is_diatom")
  private val dim = Seq(("S1", 5.0), ("S2", 2.0)).toDF("sample", "ml_analyzed")
  private val classDim = Seq(
    ("Alexandrium_spp", 109711L, "Alexandrium", "Myzozoa"),
    ("Nodularia_spumigena", 160566L, "Nodularia spumigena", "Cyanobacteria"),
    ("Ditylum_brightwellii", 149151L, "Ditylum brightwellii", "Ochrophyta")
  ).toDF("class_name", "aphia_id", "class_clean", "worms_phylum")
  private val habDim = Seq(
    (109711L, Some(1000L)), (160566L, None: Option[Long])
  ).toDF("aphia_id", "warning_level")

  private lazy val result = HabAlert.runDaily(
    roi, dim, classDim, habDim, "2024-06-01")

  test("per-taxon max sample with deterministic tie-break and rounding") {
    val mc = result.maxCounts.collect()
      .map(r => r.getAs[Long]("aphia_id") -> r).toMap
    assert(mc.keySet == Set(109711L, 160566L)) // HAB taxa only
    val alex = mc(109711L)
    // S2: 2 rois / 2 ml -> 1000/L beats S1: 1/5ml -> 200/L
    assert(alex.getAs[String]("sample") == "S2")
    assert(alex.getAs[Long]("counts_per_liter") == 1000L)
    val nod = mc(160566L)
    assert(nod.getAs[String]("sample") == "S1")
    assert(nod.getAs[Long]("counts_per_liter") == 200L)
  }

  test("bloom bands follow the carbon case_when chain") {
    val bands = result.biomass.collect()
      .map(r => r.getAs[String]("sample") ->
        (r.getAs[Double]("total_carbon"), r.getAs[String]("bloom_category"))).toMap
    // S2 diatom carbon: 0.288*90000^0.811 pg over 2 ml -> ug/L
    val s2carbon = bands("S2")._1
    assert(s2carbon > 0)
    val expectCat = (c: Double) =>
      if (c > 120) "Major bloom" else if (c >= 70) "Bloom"
      else if (c >= 40) "Minor bloom" else "No bloom"
    bands.values.foreach { case (c, cat) => assert(cat == expectCat(c)) }
  }

  test("alert detection drives the subject and red rows in the HTML") {
    // Alexandrium hits exactly 1000/L with warning 1000 -> NOT above
    assert(!result.warningDetected)
    assert(result.subject == "IFCB HAB Summary - 2024-06-01")
    assert(result.html.contains("Alexandrium"))
    assert(result.html.contains("timeline?dataset=RV_Svea&amp;bin=S2"))
    assert(!result.html.contains("background-color:#ffcccc;font-weight:bold;\"><td>"))

    // raise concentration: 3 rois in S2 -> 1500/L > 1000 -> ALERT
    val roi2 = roi.unionByName(
      Seq(("S2", "Alexandrium_spp", 4000.0, false))
        .toDF("sample", "class_name", "vol_um3", "is_diatom"))
    val alert = HabAlert.runDaily(roi2, dim, classDim, habDim, "2024-06-01")
    assert(alert.warningDetected)
    assert(alert.subject == "IFCB HAB ALERT - 2024-06-01")
    assert(alert.html.contains("background-color:#ffcccc;font-weight:bold;"))
  }

  test("deliver sends one HAB mail per day with the ALERT subject on warning") {
    val roi2 = roi.unionByName(
      Seq(("S2", "Alexandrium_spp", 4000.0, false))
        .toDF("sample", "class_name", "vol_um3", "is_diatom"))
    val cfg = HabAlert.Config(
      recipients = Seq("hab@example.org"), bawsRecipients = Seq("baws@example.org"))
    val inSeason = HabAlert.runDaily(roi2, dim, classDim, habDim, "2024-06-01", cfg)
    val mailer = new graft.sources.RecordingMailer
    HabAlert.deliver(inSeason, mailer, cfg)
    // exactly one HAB mail + one BAWS mail (June is inside the gate)
    assert(mailer.sent.map(_._3) ==
      Seq("IFCB HAB ALERT - 2024-06-01", "IFCB BAWS Summary - 2024-06-01"))
    assert(mailer.sent.head._1 == cfg.mailFrom)
    assert(mailer.sent.head._2 == Seq("hab@example.org"))
    assert(mailer.sent.head._4.contains("background-color:#ffcccc"))
    assert(mailer.sent(1)._2 == Seq("baws@example.org"))

    // out of season: the BAWS mail is gated off, the HAB summary still goes
    val winter = HabAlert.runDaily(roi, dim, classDim, habDim, "2024-01-15", cfg)
    val m2 = new graft.sources.RecordingMailer
    HabAlert.deliver(winter, m2, cfg)
    assert(m2.sent.map(_._3) == Seq("IFCB HAB Summary - 2024-01-15"))
  }

  test("cyano table filters by phylum regardless of HAB membership") {
    val cy = result.cyano.collect()
    assert(cy.length == 1)
    assert(cy.head.getAs[Long]("aphia_id") == 160566L)
  }

  test("BAWS branch: priority-species rows green, seasonal gate, own subject") {
    assert(result.bawsSubject == "IFCB BAWS Summary - 2024-06-01")
    assert(result.bawsSendToday) // June is in the May-Oct window
    // Nodularia spumigena is a priority species -> green row
    assert(result.bawsHtml.contains(
      "background-color:#d4edda;color:#155724;font-weight:bold;"))
    assert(result.bawsHtml.contains("Nodularia spumigena"))
    // no warning-level column in the BAWS table
    assert(!result.bawsHtml.contains("<th>Warning level</th>"))
    // out-of-season dates gate the send
    assert(!HabAlert.bawsInSeason("2024-11-15"))
    assert(!HabAlert.bawsInSeason("2024-04-30"))
    assert(HabAlert.bawsInSeason("2024-05-01") && HabAlert.bawsInSeason("2024-10-31"))
  }

  test("bloom notice renders for bloom-level samples") {
    // scale volumes up so S2 total carbon passes the 120 ug/L band
    val bigRoi = roi.withColumn("vol_um3", col("vol_um3") * 50)
    val r = HabAlert.runDaily(bigRoi, dim, classDim, habDim, "2024-06-01")
    assert(r.html.contains("reached bloom level"))
    val cat = r.biomass.filter(col("bloom_category") =!= "No bloom")
      .collect().head.getAs[String]("bloom_category")
    assert(r.html.contains(s"($cat)"))
  }
}
