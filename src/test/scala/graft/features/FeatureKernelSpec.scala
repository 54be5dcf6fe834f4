package graft.features

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Golden-parity tests for the feature-extraction kernel: expected values
  * are produced by the REFERENCE implementation (ifcb-features Python)
  * running over the same fixtures — see tools/golden_features.py for how
  * they are generated and exactly which primitives are shimmed.
  *
  * Float32-deterministic reference paths (distmap biovolume) are compared
  * at 1e-5 relative; float64 paths at 1e-9 relative (the reference's
  * np.sum uses pairwise summation, so the last bits legitimately differ).
  * Segmentation masks (stand-in edge detector on both sides) compare
  * pixel-exact.
  */
class FeatureKernelSpec extends AnyFunSuite {

  private lazy val golden: JValue = {
    val in = getClass.getResourceAsStream("/features_golden.json")
    require(in != null, "features_golden.json missing — run tools/golden_features.py")
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    JsonMethods.parse(txt)
  }

  private def maskOf(v: JValue): Mask =
    Mask.from(v.asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s))

  private def grayOf(v: JValue): Segmentation.Gray = {
    val rows = v.asInstanceOf[JArray].arr.map(_.asInstanceOf[JArray].arr.map {
      case JInt(n)    => n.toInt
      case JDouble(d) => d.toInt
      case other      => fail(s"unexpected $other")
    })
    val h = rows.size; val w = rows.head.size
    Segmentation.Gray(h, w, rows.flatten.toArray)
  }

  private val float32Cols = Set("Biovolume", "RepresentativeWidth", "SurfaceArea",
    "summedBiovolume", "summedSurfaceArea")

  private def rowValue(r: Features.FeatureRow, name: String): Double = name match {
    case "Area" => r.Area
    case "Biovolume" => r.Biovolume
    case "BoundingBox_xwidth" => r.BoundingBox_xwidth
    case "BoundingBox_ywidth" => r.BoundingBox_ywidth
    case "ConvexArea" => r.ConvexArea
    case "ConvexPerimeter" => r.ConvexPerimeter
    case "Eccentricity" => r.Eccentricity
    case "EquivDiameter" => r.EquivDiameter
    case "Extent" => r.Extent
    case "MajorAxisLength" => r.MajorAxisLength
    case "MinorAxisLength" => r.MinorAxisLength
    case "Orientation" => r.Orientation
    case "Perimeter" => r.Perimeter
    case "RepresentativeWidth" => r.RepresentativeWidth
    case "Solidity" => r.Solidity
    case "SurfaceArea" => r.SurfaceArea
    case "maxFeretDiameter" => r.maxFeretDiameter
    case "minFeretDiameter" => r.minFeretDiameter
    case "numBlobs" => r.numBlobs
    case "summedArea" => r.summedArea
    case "summedBiovolume" => r.summedBiovolume
    case "summedConvexArea" => r.summedConvexArea
    case "summedConvexPerimeter" => r.summedConvexPerimeter
    case "summedMajorAxisLength" => r.summedMajorAxisLength
    case "summedMinorAxisLength" => r.summedMinorAxisLength
    case "summedPerimeter" => r.summedPerimeter
    case "summedSurfaceArea" => r.summedSurfaceArea
    case "Area_over_PerimeterSquared" => r.Area_over_PerimeterSquared
    case "Area_over_Perimeter" => r.Area_over_Perimeter
    case "summedConvexPerimeter_over_Perimeter" => r.summedConvexPerimeter_over_Perimeter
    case other => fail(s"unknown feature $other")
  }

  private def fixtures(section: String): List[(String, JValue)] =
    (golden \ section).asInstanceOf[JObject].obj.map { case (k, v) => (k, v) }

  for ((name, fx) <- fixtures("features")) {
    test(s"feature parity vs reference kernel: $name") {
      val mask = maskOf(fx \ "mask")
      val got = Features.compute(0L, mask)
      val expected = (fx \ "expected").asInstanceOf[JObject].obj
      for ((col, jv) <- expected) {
        val want: Double = jv match {
          case JNull      => Double.NaN
          case JDouble(d) => d
          case JInt(n)    => n.toDouble
          case other      => fail(s"unexpected $other")
        }
        val have = rowValue(got, col)
        val tol = if (float32Cols(col)) 1e-5 else 1e-9
        if (want.isNaN) assert(have.isNaN, s"$col: expected NaN, got $have")
        else {
          val rel = math.abs(have - want) / math.max(math.abs(want), 1e-12)
          assert(rel <= tol, s"$col: got $have, want $want (rel $rel)")
        }
      }
    }
  }

  for ((name, fx) <- fixtures("features_ext")) {
    test(s"extended feature parity vs reference kernel: $name") {
      val base = (golden \ "features" \ name)
      val mask = maskOf(base \ "mask")
      val roi = grayOf(base \ "roi")
      val got = ExtendedFeatures.compute(mask, roi)
      val expected = (fx \ "expected").asInstanceOf[JObject].obj
      for ((col, jv) <- expected) {
        val want: Double = jv match {
          case JNull      => Double.NaN
          case JDouble(d) => d
          case JInt(n)    => n.toDouble
          case other      => fail(s"unexpected $other")
        }
        val have = got.getOrElse(col, fail(s"missing extended feature $col"))
        if (want.isNaN) assert(have.isNaN, s"$col: expected NaN, got $have")
        else {
          val rel = math.abs(have - want) / math.max(math.abs(want), 1e-12)
          assert(rel <= 1e-9, s"$col: got $have, want $want (rel $rel)")
        }
      }
    }
  }

  for ((name, fx) <- fixtures("segmentation")) {
    test(s"segmentation parity vs reference chain (Sobel edges): $name") {
      val roi = grayOf(fx \ "roi")
      val want = (fx \ "mask").asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
      val got = Segmentation.segmentRoi(roi, Segmentation.sobelEdges)
      val gotRows = (0 until got.h).map(i =>
        (0 until got.w).map(j => if (got(i, j)) '1' else '0').mkString)
      assert(gotRows == want, s"segmentation mask mismatch for $name")
    }
  }

  for ((name, fx) <- fixtures("phasecong")) {
    test(s"phase congruency M+m parity vs numpy transcription: $name") {
      val roi = grayOf((golden \ "segmentation" \ name) \ "roi")
      val want = (fx \ "mm").asInstanceOf[JArray].arr.map(
        _.asInstanceOf[JArray].arr.map {
          case JDouble(d) => d
          case JInt(n)    => n.toDouble
          case other      => fail(s"unexpected $other")
        })
      val got = PhaseCongruency.edges(roi)
      for (i <- 0 until roi.h; j <- 0 until roi.w) {
        val g = got(i * roi.w + j); val e = want(i)(j)
        assert(math.abs(g - e) <= 1e-9 * math.max(math.abs(e), 1.0),
          s"($i,$j): got $g want $e")
      }
    }
  }

  test("modifiedHausdorff terminates and matches brute force when points carry NaN (round-14 ADVICE)") {
    // the x-sorted pruning sweep spun forever on a NaN query x (every
    // comparison false once hi exhausted); a NaN gap now exhausts that
    // side, reproducing the old brute force's ignore-NaN behavior
    def brute(a: Array[(Double, Double)], b: Array[(Double, Double)]): Double = {
      def mean(from: Array[(Double, Double)], to: Array[(Double, Double)]): Double =
        from.map { case (y, x) =>
          var best = Double.MaxValue
          to.foreach { case (ty, tx) =>
            val d = (y - ty) * (y - ty) + (x - tx) * (x - tx)
            if (d < best) best = d
          }
          math.sqrt(best)
        }.sum / from.length
      math.max(mean(b, a), mean(a, b))
    }
    val clean = Array((0.0, 0.0), (1.0, 2.0), (3.0, 1.0))
    val nanQuery = Array((0.5, Double.NaN), (1.0, 1.0))
    val nanTarget = Array((0.0, 1.0), (Double.NaN, Double.NaN))
    for ((a, b) <- Seq((nanQuery, clean), (clean, nanTarget), (nanQuery, nanTarget))) {
      val fast = ExtendedFeatures.modifiedHausdorff(a, b) // must terminate
      val ref = brute(a, b)
      assert(fast == ref || (fast.isNaN && ref.isNaN), s"$fast != $ref")
    }
  }

  test("edt2 handles masks with empty leading/trailing columns (finite-INF envelope)") {
    // round-12 review candidate, REFUTED empirically and pinned here:
    // the 1e20 sentinel is finite, so (INF+q^2)-(INF+v^2) collapses to
    // exactly 0.0 in double (q^2 absorbed) and the lower envelope stays
    // well-formed -- no NaN boundaries, exact distances even when the
    // leftmost columns hold no sites
    assert(Raster.edt2(Mask.from(Seq("001"))).toSeq == Seq(4.0, 1.0, 0.0))
    assert(Raster.edt2(Mask.from(Seq("100"))).toSeq == Seq(0.0, 1.0, 4.0))
    assert(Raster.edt2(Mask.from(Seq("0001000"))).toSeq ==
      Seq(9.0, 4.0, 1.0, 0.0, 1.0, 4.0, 9.0))
  }

  for ((name, fx) <- fixtures("segmentation_pc")) {
    test(s"segmentation parity with phase-congruency edges (default): $name") {
      val roi = grayOf((golden \ "segmentation" \ name) \ "roi")
      val want = (fx \ "mask").asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
      val got = Segmentation.segmentRoi(roi)
      val gotRows = (0 until got.h).map(i =>
        (0 until got.w).map(j => if (got(i, j)) '1' else '0').mkString)
      assert(gotRows == want, s"pc segmentation mask mismatch for $name")
    }
  }
}
