package graft.agg

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A17 PSD fit: golden values on a known power law and partitioning
  * independence (SURVEY.md §7.4 risk 5).
  */
class PsdFitSpec extends SparkSpec {
  import spark.implicits._

  // exact power law n = 1000 · x^-2  →  slope -2, intercept ln(1000), R² 1
  private val bins: Seq[(Double, Double)] =
    (1 to 10).map { i =>
      val x = i * 5.0
      (math.log(x), math.log(1000.0 * math.pow(x, -2.0)))
    }

  test("typed Aggregator recovers slope/intercept/r2 exactly on a pure power law") {
    val agg = new PsdFit().toColumn
    val r = bins.toDS().select(agg).head()
    assert(math.abs(r.slope - -2.0) < 1e-9)
    assert(math.abs(r.intercept - math.log(1000.0)) < 1e-9)
    assert(math.abs(r.r2 - 1.0) < 1e-9)
    assert(r.nBins == 10)
  }

  test("result is stable under repartitioning to fp rounding") {
    // double moment sums commute only up to fp rounding; the exactly
    // order-independent path is the decimal-cast DataFrame form (q38)
    val agg = new PsdFit().toColumn
    val one = bins.toDS().repartition(1).select(agg).head()
    val many = bins.toDS().repartition(7).select(agg).head()
    assert(math.abs(one.slope - many.slope) < 1e-12)
    assert(math.abs(one.intercept - many.intercept) < 1e-12)
  }

  test("degenerate inputs: <2 bins → NaN, vertical data → NaN slope") {
    val agg = new PsdFit().toColumn
    val r1 = Seq((1.0, 2.0)).toDS().select(agg).head()
    assert(r1.slope.isNaN && r1.nBins == 1)
    val r2 = Seq((1.0, 2.0), (1.0, 3.0)).toDS().select(agg).head()
    assert(r2.slope.isNaN) // same x for all rows: det == 0
  }

  test("DataFrame moments path matches the Aggregator") {
    val df = bins.toDF("lnx", "lny")
    val m = df.agg(
      count(lit(1)).as("n"),
      sum($"lnx").as("sx"), sum($"lny").as("sy"),
      sum($"lnx" * $"lnx").as("sxx"), sum($"lnx" * $"lny").as("sxy"),
      sum($"lny" * $"lny").as("syy"))
    val (slope, intercept, r2) = PsdFit.solveCols(
      $"n".cast("double"), $"sx", $"sy", $"sxx", $"sxy", $"syy")
    val row = m.select(slope.as("s"), intercept.as("i"), r2.as("r")).head()
    assert(math.abs(row.getDouble(0) - -2.0) < 1e-9)
    assert(math.abs(row.getDouble(1) - math.log(1000.0)) < 1e-9)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-9)
  }

  test("flag rules fire in priority order") {
    val df = Seq(
      (Some(-2.0), Some(0.99), 40L),   // incomplete wins over ok
      (Some(-2.0), Some(0.20), 100L),  // poor fit
      (Some(-0.05), Some(0.99), 100L), // flat
      (Some(-2.0), Some(0.99), 100L),  // ok
      // degenerate fit (k<2 / zero det → NULL slope+r2): must flag, not
      // fall through to ok (round-12 review)
      (None, None, 100L),
      (None, None, 40L)                // incomplete still wins
    ).toDF("slope", "r2", "total")
    val flags = df.select(PsdFit.flag($"slope", $"r2", $"total")).as[String].collect()
    assert(flags.toSeq == Seq(
      "incomplete", "poor_fit", "flat_psd", "ok", "flat_psd", "incomplete"))
  }

  test("flags7: every reference rule fires at its threshold, in signature order") {
    // (r2, peakEsd, peakN, total, triggers, ml, humidity) per case; the
    // reference production thresholds (ifcb_ingest_and_qc.R:505-516)
    val p = PsdFit.FlagParams() // beads 1e20, bubbles 110, inc (1500, 3),
                                // missing .5, biomass 3000, bloom 10, hum 75
    val cases = Seq(
      // beads disabled at 1e20 by construction — tested with a finite copy below
      (0.9, 120.5, 800L, 20000L, 20000L, 5.0, 50.0, "Bubbles"),
      (0.9, 16.5, 800L, 1400L, 1400L, 5.0, 50.0, "Incomplete Run"), // count
      (0.9, 16.5, 800L, 20000L, 20000L, 2.5, 50.0, "Incomplete Run"), // volume
      (0.9, 16.5, 800L, 20000L, 50000L, 5.0, 50.0, "Missing Cells"),
      (0.9, 16.5, 800L, 2000L, 2000L, 5.0, 50.0, "Low Biomass"), // 400/mL
      (0.9, 30.5, 800L, 20000L, 20000L, 5.0, 50.0, "Bloom"), // peak 15.5 µm past start 15
      (0.9, 16.5, 800L, 20000L, 20000L, 5.0, 80.0, "High Humidity"),
      (0.3, 16.5, 800L, 20000L, 20000L, 5.0, 50.0, "Poor Fit"),
      (0.9, 16.5, 800L, 20000L, 20000L, 5.0, 50.0, "ok"))
    val df = cases.toDF("r2", "esd", "pn", "tot", "trig", "ml", "hum", "want")
    val got = df.select(
      PsdFit.flags7(p, startFitUm = 15.0)(
        $"r2", $"esd", $"pn", $"tot", $"trig", $"ml", $"hum").as("flag"),
      $"want").as[(String, String)].collect()
    got.foreach { case (flag, want) => assert(flag == want, s"want $want got $flag") }

    // beads with a reachable threshold outranks everything
    val pb = p.copy(beads = 500.0)
    val beads = Seq((0.3, 120.5, 800L, 100L, 50000L, 2.5, 80.0)).toDF(
      "r2", "esd", "pn", "tot", "trig", "ml", "hum")
      .select(PsdFit.flags7(pb, 15.0)(
        $"r2", $"esd", $"pn", $"tot", $"trig", $"ml", $"hum")).as[String].head()
    assert(beads == "Beads")
  }

  test("moments aggregates complete pairs only and matches the Aggregator") {
    // round-12 review: fit_n counted every row while the sums skipped
    // nulls — a non-positive log() input silently skewed n against the
    // moments and produced wrong (not null) fit parameters
    val clean = bins.map { case (x, y) => (Some(x), Some(y)) }
    val dirty = clean :+ ((None: Option[Double], Some(1.0))) :+
      ((Some(1.0), None: Option[Double]))
    val df = dirty.toDF("lnx", "lny")
    val ms = PsdFit.moments($"lnx", $"lny")
    val m = df.agg(ms.head._2.as(ms.head._1),
      ms.tail.map { case (n, c) => c.as(n) }: _*)
    val (slope, intercept, r2) = PsdFit.solveCols(
      $"fit_n".cast("double"), $"fit_sx", $"fit_sy",
      $"fit_sxx", $"fit_sxy", $"fit_syy")
    val row = m.select($"fit_n", slope.as("s"), intercept.as("i"), r2.as("r")).head()
    assert(row.getLong(0) == bins.length, "incomplete pairs must not count")
    assert(math.abs(row.getDouble(1) - -2.0) < 1e-9)
    assert(math.abs(row.getDouble(2) - math.log(1000.0)) < 1e-9)
    assert(math.abs(row.getDouble(3) - 1.0) < 1e-9)
  }

  test("flags7: a null instrument metric disables its rule, never fires it") {
    val p = PsdFit.FlagParams()
    val df = Seq("x").toDF("k").select(
      PsdFit.flags7(p, 15.0)(
        lit(0.9), lit(16.5), lit(800L), lit(20000L),
        lit(null).cast("long"), lit(null).cast("double"),
        lit(null).cast("double"))).as[String].head()
    assert(df == "ok") // no humidity/volume/trigger recorded → clean
  }

  test("flags7: zero trigger count / zero volume disable their rules, never crash (ANSI)") {
    // round-12 review: ANSI division throws on a zero divisor even for
    // doubles; the guards null the ratio, which fires() disables —
    // matching DuckDB's null-on-zero division in the q88 oracle
    val p = PsdFit.FlagParams()
    val flag = Seq("x").toDF("k").select(
      PsdFit.flags7(p, 15.0)(
        lit(0.9), lit(16.5), lit(800L), lit(20000L),
        lit(0L), lit(0.0), lit(50.0))).as[String].head()
    // ml = 0.0 < incompleteVolumeMl fires first — the point is no crash
    assert(flag == "Incomplete Run")
    val flag2 = Seq("x").toDF("k").select(
      PsdFit.flags7(p.copy(incompleteVolumeMl = 0.0), 15.0)(
        lit(0.9), lit(16.5), lit(800L), lit(20000L),
        lit(0L), lit(0.0), lit(50.0))).as[String].head()
    assert(flag2 == "ok") // both divisor rules disabled, nothing else fires
  }

  test("flags7: a null r2 (unfittable PSD) fires Poor Fit, not ok") {
    // round-12 review: r2 is fit-derived, so null means the fit was
    // degenerate — an unfittable sample must not ship flagged clean
    val p = PsdFit.FlagParams()
    val df = Seq("x").toDF("k").select(
      PsdFit.flags7(p, 15.0)(
        lit(null).cast("double"), lit(16.5), lit(800L), lit(20000L),
        lit(40000L), lit(5.0), lit(50.0))).as[String].head()
    assert(df == "Poor Fit")
  }
}
