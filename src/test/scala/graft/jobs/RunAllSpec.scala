package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import RunAll.{ClassifierData, RunParams}

/** RunAll against two fixture classifiers: the folded orchestration must
  * equal running each config through [[SharkExport.delivery]]
  * individually (`code/run_all.R:5-30` params_list semantics — multiyear
  * toggle, per-config flag terms), resolve each classifier's inputs
  * exactly once, and write the reference's per-config output layout.
  */
class RunAllSpec extends SparkSpec {
  import spark.implicits._

  // sample ids are parseable timestamps (the delivery's MYEAR/year-filter
  // key); three years for classifier A, one for B
  private def sampleId(year: Int, i: Int): String =
    f"$year%04d-${1 + i % 8}%02d-10 12:00:${i % 50}%02d"

  private def classifier(tag: String, years: Seq[Int]): ClassifierData = {
    val rows = for {
      y <- years
      i <- 0 until 30
      cls <- Seq("Mesodinium_rubrum", s"class_$tag")
    } yield (sampleId(y, i), cls, 100.0 + i, cls.startsWith("class"))
    val roi = rows.toDF("sample", "class_name", "vol_um3", "is_diatom")
    val samples = rows.map(_._1).distinct
    val dim = samples.map(s => (s, 3.0, 57.5, 11.8))
      .toDF("sample", "ml_analyzed", "lat", "lon")
    val flags = samples.zipWithIndex.collect {
      case (s, i) if i % 7 == 0 => (s, if (i % 14 == 0) "bubbles" else "near land")
    }.toDF("sample", "flag")
    ClassifierData(roi, dim, flags)
  }

  private val adjacency = substring($"sample", 1, 4) // year grain

  private def collectSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("folded configs equal individual delivery runs; scans resolve once per classifier") {
    val dataA = classifier("A", Seq(2022, 2023, 2024))
    val dataB = classifier("B", Seq(2016))
    var resolutions = Map.empty[String, Int].withDefaultValue(0)
    val data: String => ClassifierData = { name =>
      resolutions += name -> (resolutions(name) + 1)
      name match { case "Baltic" => dataA; case "Tangesund" => dataB }
    }
    val configs = Seq(
      RunParams("Baltic", Seq(2022, 2023, 2024),
        Seq("bubbles", "near land"), multiyearDelivery = true),
      RunParams("Baltic", Seq(2022, 2023),
        Seq("bubbles"), multiyearDelivery = false),
      RunParams("Tangesund", Seq(2016),
        Seq("bubbles"), multiyearDelivery = false))
    val produced = scala.collection.mutable.ArrayBuffer.empty[RunAll.Delivery]
    val summary = RunAll.run(spark, data, configs, adjacency, produced += _)

    // one resolution per distinct classifier, shared across its configs
    assert(resolutions == Map("Baltic" -> 1, "Tangesund" -> 1))
    // config 1 → one multiyear delivery; config 2 → one per year; config 3 → one
    assert(produced.map(d => (d.params.classifier, d.years)).toSet == Set(
      ("Baltic", Seq(2022, 2023, 2024)), ("Baltic", Seq(2022)),
      ("Baltic", Seq(2023)), ("Tangesund", Seq(2016))))

    // each produced frame equals the individual pipeline run
    for (d <- produced) {
      val base = if (d.params.classifier == "Baltic") dataA else dataB
      val individual = SharkExport.delivery(
        base.roi.filter(year(try_to_timestamp($"sample"))
          .isin(d.years.map(Integer.valueOf): _*)),
        base.sampleDim, base.flags, d.params.removeFlagged, adjacency)
      assert(collectSet(d.frame) == collectSet(individual),
        s"${d.params.classifier} ${d.years}")
      assert(d.frame.count() > 0, s"empty delivery ${d.params.classifier} ${d.years}")
    }

    // summary accounting matches the frames; removed_flags carries the
    // config identity, so configs differing only in flag terms resolve
    // to THEIR delivery, not each other's
    val sm = summary.as[(String, String, String, Long, Long)].collect()
    assert(sm.length == 4)
    for ((cls, yrs, rf, nRows, nSamples) <- sm) {
      val d = produced.find(p =>
        p.params.classifier == cls && p.years.mkString("_") == yrs &&
          p.params.removeFlagged.mkString(",") == rf).get
      assert(nRows == d.frame.count())
      assert(nSamples == d.frame.select("SMPNO").distinct().count())
    }
  }

  test("a sample id that cannot be year-scoped raises instead of silently vanishing") {
    // canonical IFCB ids parse via the HdrSource codec branch of
    // SharkExport.sampleTimestamp — only ids matching NEITHER format raise
    val base = classifier("A", Seq(2023))
    val poisoned = base.copy(roi = base.roi.unionByName(
      Seq(("corrupt-sample-id", "x", 1.0, false))
        .toDF("sample", "class_name", "vol_um3", "is_diatom")))
    val e = intercept[Exception] {
      RunAll.run(spark, _ => poisoned,
        Seq(RunParams("Baltic", Seq(2023), Seq.empty, multiyearDelivery = true)),
        adjacency)
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(messages(e).contains("not timestamp-parseable"), messages(e))
  }

  test("year-scoped adjacency sees the FULL run sequence, not the year slice") {
    // round-12 review: with an adjacency partition coarser than year
    // (here: one instrument), a bubbles sample on Dec 31 must drop its
    // Jan 1 neighbor in the per-year delivery exactly as the multiyear
    // run would — lag/lead over the year-filtered subset kept it
    val roi = Seq(
      ("2022-12-31 23:59:50", "algae", 100.0, false), // bubbles
      ("2023-01-01 00:00:10", "algae", 100.0, false), // its neighbor
      ("2023-06-01 12:00:00", "algae", 100.0, false)
    ).toDF("sample", "class_name", "vol_um3", "is_diatom")
    val dim = roi.select($"sample").distinct()
      .withColumn("ml_analyzed", lit(3.0))
      .withColumn("lat", lit(57.5)).withColumn("lon", lit(11.8))
    val flags = Seq(("2022-12-31 23:59:50", "bubbles")).toDF("sample", "flag")
    val d2023 = RunAll.deliveryFor(roi, dim, flags,
      RunParams("Baltic", Seq(2023), Seq("bubbles"), multiyearDelivery = false),
      Seq(2023), lit("inst1"))
    val kept = d2023.select("SMPNO").as[String].collect().toSet
    assert(kept == Set("2023-06-01 12:00:00"),
      s"the Jan 1 neighbor of the flagged Dec 31 sample must drop: $kept")
  }

  test("writeTsv lays out one delivery directory per config, reference-named") {
    val out = Files.createTempDirectory("runall").toString
    val data: String => ClassifierData =
      _ => classifier("A", Seq(2023))
    RunAll.run(spark, data,
      Seq(RunParams("Skagerrak-Kattegat", Seq(2023), Seq("bubbles"),
        multiyearDelivery = true)),
      adjacency, RunAll.writeTsv(out))
    val dir = new java.io.File(s"$out/ifcb_data_export_Skagerrak-Kattegat_2023")
    assert(dir.isDirectory, s"missing ${dir}")
    val read = spark.read.option("sep", "\t").option("header", "true").csv(dir.toString)
    assert(read.count() > 0)
    assert(read.columns.contains("SMPNO") && read.columns.contains("C_CONC"))
  }

  test("tsvSink keeps colliding configs apart (flag-term-only variants, round-14)") {
    // the reference's naming omits the flag-term identity, so two
    // configs differing only in removeFlagged mapped to ONE directory
    // and the second overwrite silently discarded the first delivery
    val out = Files.createTempDirectory("runall-collide").toString
    val data: String => ClassifierData = _ => classifier("A", Seq(2023))
    val configs = Seq(
      RunParams("Baltic", Seq(2023), Seq("bubbles"), multiyearDelivery = true),
      RunParams("Baltic", Seq(2023), Nil, multiyearDelivery = true))
    RunAll.run(spark, data, configs, adjacency, RunAll.tsvSink(out, configs))
    val dirs = new java.io.File(out).list().toSet
    assert(dirs.size == 2, s"expected two delivery dirs, got $dirs")
    assert(dirs.exists(_.contains("excl")), dirs)
    // a non-colliding config keeps the bare reference name
    val out2 = Files.createTempDirectory("runall-single").toString
    val single = Seq(RunParams("Baltic", Seq(2023), Nil, multiyearDelivery = true))
    RunAll.run(spark, data, single, adjacency, RunAll.tsvSink(out2, single))
    assert(new java.io.File(s"$out2/ifcb_data_export_Baltic_2023").isDirectory)
  }
}
