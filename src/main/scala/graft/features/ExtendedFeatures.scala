package graft.features

/** Non-slim feature tail of the reference kernel — perimeter-distance
  * statistics, Hausdorff/binary symmetry, rotated-box properties,
  * invariant moments, texture statistics, and HOG — mirroring
  * `ifcb-features/ifcb_features/{perimeter,blob_geometry,texture,hog}.py`
  * arithmetic exactly (the deterministic LCG sampling, MATLAB prctile,
  * half-even rounding, population moments). These populate the EcoTaxa
  * contract's `object_perimeter_*`, `object_h*`, `object_rotated_*`,
  * `object_moment_invariant*`, `object_texture_*`, `object_hog*` columns.
  */
object ExtendedFeatures {

  // --- deterministic sampling (random.py:5-26) -----------------------------

  /** `simple_prng`: out_j = (prev·30203) mod 29663, reshaped Fortran-order
    * then mod n. For shape (m, 2): column 0 = first m draws, column 1 =
    * next m.
    */
  def simplePrng(n: Int, size: Int, seed: Long = 1L): Array[Int] = {
    val out = new Array[Int](size)
    var prev = seed
    var j = 0
    while (j < size) {
      prev = (prev * 30203L) % 29663L
      out(j) = (prev % n).toInt
      j += 1
    }
    out
  }

  /** `subsample_dist` (perimeter.py:40-54): points sorted by y·max(x)+x,
    * m = min(n², 10000) sampled pairs via [[simplePrng]], euclidean
    * distances.
    *
    * Tie semantics (round-12 review): the key COLLIDES whenever the
    * perimeter contains both (y, maxX) and (y+1, 0) — common for
    * rectangle-ish blobs — and the reference resolves ties with a
    * NON-STABLE numpy argsort, i.e. its own output is
    * platform/version-dependent there. Scala's stable sortBy picks the
    * row-major order, which is one fixed representative of the
    * reference's ambiguous set — deterministic on our side, and exact
    * parity wherever the reference's keys are unique (the golden
    * generator asserts uniqueness for its fixtures, so goldens pin the
    * unambiguous regime).
    */
  def subsampleDist(pts: Array[(Int, Int)], maxN: Int = 10000): Array[Double] = {
    val n = pts.length
    val maxX = pts.map(_._2).max
    val sorted = pts.sortBy { case (y, x) => y.toLong * maxX + x }
    val m = math.min(n.toLong * n, maxN.toLong).toInt
    val draws = simplePrng(n, 2 * m)
    Array.tabulate(m) { j =>
      val (ya, xa) = sorted(draws(j))
      val (yb, xb) = sorted(draws(m + j))
      math.sqrt(((ya - yb).toDouble * (ya - yb)) + ((xa - xb).toDouble * (xa - xb)))
    }
  }

  /** mean/median/skewness/kurtosis (perimeter.py:14-21; population
    * moments, Pearson kurtosis).
    */
  def histStats(arr: Array[Double]): (Double, Double, Double, Double) = {
    val n = arr.length
    val mean = arr.sum / n
    val s = arr.sorted
    val median = if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    var m2 = 0.0; var m3 = 0.0; var m4 = 0.0
    for (v <- arr) {
      val d = v - mean
      m2 += d * d; m3 += d * d * d; m4 += d * d * d * d
    }
    m2 /= n; m3 /= n; m4 /= n
    (mean, median, m3 / math.pow(m2, 1.5), m4 / (m2 * m2))
  }

  /** Pairwise-distance stats of the perimeter normalized by equivalent
    * diameter (perimeter.py:56-67).
    */
  def perimeterStats(perimPts: Array[(Int, Int)], equivDiameter: Double): (Double, Double, Double, Double) =
    histStats(subsampleDist(perimPts).map(_ / equivDiameter))

  // --- symmetry (perimeter.py:92-104, blob_geometry.py:210-225) ------------

  /** Modified Hausdorff distance (Dubuisson & Jain 1994). */
  def modifiedHausdorff(a: Array[(Double, Double)], b: Array[(Double, Double)]): Double = {
    // EXACT nearest neighbor with an x-sorted sweep (round-14 review):
    // the brute-force double loop was O(|a|·|b|) per directed pass — six
    // passes per ROI on the extractFull hot path; sorting `to` by x and
    // scanning outward from the query's x rank prunes once (dx)² beats
    // the running best, the same distances to the last bit (min over a
    // subset provably containing the argmin).
    def meanNearest(from: Array[(Double, Double)], to: Array[(Double, Double)]): Double = {
      val byX = to.sortBy(_._2)
      val xs = byX.map(_._2)
      var sum = 0.0
      for ((y, x) <- from) {
        var lo = java.util.Arrays.binarySearch(xs, x)
        if (lo < 0) lo = -lo - 1
        var hi = lo
        lo -= 1
        var best = Double.MaxValue
        while (lo >= 0 || hi < byX.length) {
          // expand the side whose next |dx| is smaller; stop a side when
          // its (dx)² already exceeds the best squared distance. A NaN
          // coordinate (query or target) makes every comparison below
          // false and would spin this loop forever — treat a NaN gap as
          // side-exhausted, which reproduces the old brute force's
          // behavior of ignoring NaN points (round-14 ADVICE)
          var dLo = if (lo >= 0) { val d = x - xs(lo); d * d } else Double.MaxValue
          if (java.lang.Double.isNaN(dLo)) { lo = -1; dLo = Double.MaxValue }
          var dHi = if (hi < byX.length) { val d = xs(hi) - x; d * d } else Double.MaxValue
          if (java.lang.Double.isNaN(dHi)) { hi = byX.length; dHi = Double.MaxValue }
          if (lo < 0 && hi >= byX.length) ()
          else
          if (dLo <= dHi) {
            if (dLo >= best) { lo = -1; if (dHi >= best) hi = byX.length }
            else {
              val (ty, tx) = byX(lo)
              val d = (y - ty) * (y - ty) + (x - tx) * (x - tx)
              if (d < best) best = d
              lo -= 1
            }
          } else {
            if (dHi >= best) { hi = byX.length; if (dLo >= best) lo = -1 }
            else {
              val (ty, tx) = byX(hi)
              val d = (y - ty) * (y - ty) + (x - tx) * (x - tx)
              if (d < best) best = d
              hi += 1
            }
          }
        }
        sum += math.sqrt(best)
      }
      sum / from.length
    }
    math.max(meanNearest(b, a), meanNearest(a, b))
  }

  /** h180/h90/hflip of the rotated blob's perimeter vs its transforms,
    * centered on shape/2 - 1 (perimeter.py:92-104).
    */
  def hausdorffSymmetry(rotated: Mask): (Double, Double, Double) = {
    val cy = rotated.h / 2.0 - 1
    val cx = rotated.w / 2.0 - 1
    val perim = Raster.perimeter(rotated)
    val p = (for (i <- 0 until rotated.h; j <- 0 until rotated.w if perim(i, j))
      yield (i - cy, j - cx)).toArray
    val p90 = p.map { case (y, x) => (x, y) }
    val p180 = p.map { case (y, x) => (-y, -x) }
    val pfud = p.map { case (y, x) => (-y, x) }
    (modifiedHausdorff(p, p180), modifiedHausdorff(p, p90), modifiedHausdorff(p, pfud))
  }

  /** b180/b90/bflip overlap ratios of the rotated (square) blob
    * (blob_geometry.py:210-225). `rot90` is counterclockwise.
    */
  def binarySymmetry(rotated: Mask): (Double, Double, Double) = {
    require(rotated.h == rotated.w, "binary symmetry expects the centered square blob")
    val n = rotated.h
    val area = rotated.count.toDouble
    def overlap(f: (Int, Int) => Boolean): Double = {
      var s = 0
      for (i <- 0 until n; j <- 0 until n) if (rotated(i, j) && f(i, j)) s += 1
      s / area
    }
    val b180 = overlap((i, j) => rotated(n - 1 - i, n - 1 - j))
    val b90 = overlap((i, j) => rotated(j, n - 1 - i)) // np.rot90 CCW
    val bflip = overlap((i, j) => rotated(n - 1 - i, j))
    (b180, b90, bflip)
  }

  /** `blob_shape` (blobs.py:136-149): center-of-pixel bounding height and
    * width of the rotated blob.
    */
  def blobShape(rotated: Mask): (Int, Int) = {
    val h = rotated.h; val w = rotated.w
    def colHas(j: Int): Boolean = (0 until h).exists(rotated(_, j))
    def rowHas(i: Int): Boolean = (0 until w).exists(rotated(i, _))
    val x0 = (0 until w).indexWhere(colHas) + 0.5
    val x1 = w - (0 until w).indexWhere(j => colHas(w - 1 - j))
    val y0 = (0 until h).indexWhere(rowHas) + 0.5
    val y1 = h - (0 until h).indexWhere(i => rowHas(h - 1 - i))
    (((y1 - y0) + 0.5).toInt, ((x1 - x0) + 0.5).toInt)
  }

  // --- invariant moments (blob_geometry.py:88-143) -------------------------

  /** Hu's seven invariant moments over the (whole-roi) blob mask. */
  def invMoments(mask: Mask): Array[Double] = {
    val h = mask.h; val w = mask.w
    var m00 = 0.0; var m10 = 0.0; var m01 = 0.0
    for (i <- 0 until h; j <- 0 until w) if (mask(i, j)) {
      m00 += 1; m10 += (j + 1); m01 += (i + 1)
    }
    val xb = m10 / m00; val yb = m01 / m00
    // central moments mu(p,q) = sum x_^p y_^q over set pixels
    val mu = Array.ofDim[Double](4, 4)
    for (i <- 0 until h; j <- 0 until w) if (mask(i, j)) {
      val dx = (j + 1) - xb; val dy = (i + 1) - yb
      var xp = 1.0
      for (p <- 0 to 3) {
        var yq = 1.0
        for (q <- 0 to 3) {
          mu(p)(q) += xp * yq
          yq *= dy
        }
        xp *= dx
      }
    }
    val mu00 = mu(0)(0)
    def eta(p: Int, q: Int): Double = mu(p)(q) / math.pow(mu00, (p + q) / 2.0 + 1.0)
    val (n20, n02, n11) = (eta(2, 0), eta(0, 2), eta(1, 1))
    val (n30, n03, n12, n21) = (eta(3, 0), eta(0, 3), eta(1, 2), eta(2, 1))
    val phi1 = n20 + n02
    val phi2 = math.pow(n20 - n02, 2) + 4 * n11 * n11
    val phi3 = math.pow(n30 - 3 * n12, 2) + math.pow(3 * n21 - n03, 2)
    val phi4 = math.pow(n30 + n12, 2) + math.pow(n21 + n03, 2)
    val phi5 = (n30 - 3 * n12) * (n30 + n12) *
      (math.pow(n30 + n12, 2) - 3 * math.pow(n21 + n03, 2)) +
      (3 * n21 - n03) * (n21 + n03) *
        (3 * math.pow(n30 + n12, 2) - math.pow(n21 + n03, 2))
    val phi6 = (n20 - n02) * (math.pow(n30 + n12, 2) - math.pow(n21 + n03, 2)) +
      4 * n11 * (n30 + n12) * (n21 + n03)
    val phi7 = (3 * n21 - n03) * (n30 + n12) *
      (math.pow(n30 + n12, 2) - 3 * math.pow(n21 + n03, 2)) +
      (3 * n12 - n30) * (n21 + n03) *
        (3 * math.pow(n30 + n12, 2) - math.pow(n21 + n03, 2))
    Array(phi1, phi2, phi3, phi4, phi5, phi6, phi7)
  }

  // --- texture (texture.py) ------------------------------------------------

  /** MATLAB `prctile` (texture.py:9-35): triangular weights over the
    * sorted sample at percentile positions.
    */
  def prctile(arr: Array[Double], ps: Seq[Double]): Seq[Double] = {
    val ap = arr.sorted
    val n = ap.length
    val pcts = Array.tabulate(n)(i => 100.0 * ((0.5 + i) / n))
    ps.map { p =>
      if (p < pcts(0)) ap(0)
      else if (p > pcts(n - 1)) ap(n - 1)
      else {
        var out = 0.0
        val unit = 100.0 / n
        for (i <- 0 until n) {
          val wgt = 1.0 - math.abs((pcts(i) - p) / unit)
          if (wgt > 0) out += wgt * ap(i)
        }
        out
      }
    }
  }

  /** Contrast-enhanced in-blob pixels (texture.py:37-42): 1st/99th
    * percentile rescale of roi/255 to [0,1], half-even rounded back to
    * 0..255, masked row-major.
    */
  def texturePixels(roi: Segmentation.Gray, mask: Mask): Array[Double] = {
    val flat = roi.data.map(_.toDouble)
    val Seq(p1, p99) = prctile(flat, Seq(1.0, 99.0))
    val lo = p1 / 255.0; val hi = p99 / 255.0
    val out = Array.newBuilder[Double]
    for (i <- 0 until roi.h; j <- 0 until roi.w) if (mask(i, j)) {
      val v = roi(i, j) / 255.0
      val clipped = math.min(math.max(v, lo), hi)
      // hi == lo (a near-uniform ROI: p1 == p99) must not divide by
      // zero — 0/0 = NaN for EVERY pixel, and statxture then silently
      // dumped the all-NaN array into one histogram bin, reporting a
      // confident-looking uniformity of exactly 1.0 next to NaN
      // mean/std (round-13 review). Constant texture reads as the
      // all-zero normalized raster: defined stats (mean 0, std 0,
      // uniformity 1, entropy 0) with no NaN.
      out += (if (hi > lo) Math.rint((clipped - lo) / (hi - lo) * 255.0)
              else 0.0)
    }
    out.result()
  }

  /** `statxture` (texture.py:44-69): gray-level stats over a 256-bin
    * histogram of the texture pixels (np.histogram semantics: uniform
    * bins over [min, max], right-inclusive last bin).
    */
  def statxture(pixels: Array[Double]): (Double, Double, Double, Double, Double, Double) = {
    val n = pixels.length
    val mean = pixels.sum / n
    var m2 = 0.0; var m3 = 0.0
    for (v <- pixels) { val d = v - mean; m2 += d * d; m3 += d * d * d }
    m2 /= n; m3 /= n
    val std = math.sqrt(m2)
    val bins = 256
    val mn = pixels.min; val mx = pixels.max
    val hist = new Array[Double](bins)
    if (mx > mn) {
      // np.histogram: index by (v-mn)·norm, then correct against the
      // linspace edges (fp division can land a boundary value one bin off)
      val norm = bins / (mx - mn)
      def edge(i: Int): Double = mn + i.toDouble * (mx - mn) / bins
      for (v <- pixels) {
        var b = math.min(((v - mn) * norm).toInt, bins - 1)
        if (b + 1 < bins && v >= edge(b + 1)) b += 1
        else if (v < edge(b)) b -= 1
        hist(b) += 1
      }
    } else hist(0) = n.toDouble
    for (b <- 0 until bins) hist(b) /= n
    val d = (bins - 1.0) * (bins - 1.0)
    val normvar = m2 / d
    val smoothness = 1.0 - 1.0 / (1.0 + normvar)
    val thirdMoment = m3 / d
    val uniformity = hist.map(h => h * h).sum
    val eps = java.lang.Math.ulp(1.0) // np.finfo(float).eps
    val entropy = -hist.map(h => h * (math.log(h + eps) / math.log(2.0))).sum
    (mean, std, smoothness, thirdMoment, uniformity, entropy)
  }

  // --- HOG (hog.py) --------------------------------------------------------

  /** 3x3-window, 9-bin histogram of oriented gradients (hog.py:8-57):
    * 81 values, window-major.
    */
  def hog(roi: Segmentation.Gray): Array[Double] = {
    val h = roi.h; val w = roi.w
    val nWin = 3; val bins = 9
    val stepX = w / (nWin + 1)
    val stepY = h / (nWin + 1)
    // gradients: correlate with [-1,0,1] row / [1,0,-1]^T column kernels
    val gx = new Array[Double](h * w)
    val gy = new Array[Double](h * w)
    for (i <- 0 until h; j <- 0 until w) {
      val left = if (j > 0) roi(i, j - 1).toDouble else 0.0
      val right = if (j < w - 1) roi(i, j + 1).toDouble else 0.0
      gx(i * w + j) = right - left
      val up = if (i > 0) roi(i - 1, j).toDouble else 0.0
      val down = if (i < h - 1) roi(i + 1, j).toDouble else 0.0
      gy(i * w + j) = up - down
    }
    val angHigh = Array.tabulate(bins)(b =>
      (-math.Pi + 2 * math.Pi / bins) + b * ((math.Pi - (-math.Pi + 2 * math.Pi / bins)) / (bins - 1)))
    val angLow = Array.tabulate(bins)(b =>
      if (b == 0) angHigh(0) - 999.0 else angHigh(b - 1))
    val out = new Array[Double](nWin * nWin * bins)
    var cont = 0
    for (n <- 0 until nWin; m <- 0 until nWin) {
      val h2 = new Array[Double](bins)
      for (i <- n * stepY until math.min((n + 2) * stepY, h);
           j <- m * stepX until math.min((m + 2) * stepX, w)) {
        val a = math.atan2(gy(i * w + j), gx(i * w + j))
        val mag = math.sqrt(gy(i * w + j) * gy(i * w + j) + gx(i * w + j) * gx(i * w + j))
        // strict upper bound: a gradient of exactly atan2(0, -x) = π
        // falls in NO bin — deliberate, hog.py:50 uses the same
        // `>= low && < high` with the last high = π (round-12 review:
        // checked against the reference, parity not a bug)
        var b = 0
        while (b < bins) {
          if (a >= angLow(b) && a < angHigh(b)) { h2(b) += mag; b = bins }
          else b += 1
        }
      }
      val norm = math.sqrt(h2.map(v => v * v).sum) + 0.01
      for (b <- 0 until bins) out(cont * bins + b) = h2(b) / norm
      cont += 1
    }
    out
  }

  // --- assembly ------------------------------------------------------------

  /** Stable column order for the extended feature set. */
  val keys: Seq[String] =
    Seq("perimeter_mean", "perimeter_median", "perimeter_skewness",
      "perimeter_kurtosis", "h180", "h90", "hflip", "b180", "b90", "bflip",
      "rotated_area", "rotated_bbox_xwidth", "rotated_bbox_ywidth",
      "rotated_bbox_solidity",
      "texture_average_gray_level", "texture_average_contrast",
      "texture_smoothness", "texture_third_moment", "texture_uniformity",
      "texture_entropy") ++
      (1 to 7).map(i => s"moment_invariant$i") ++
      (1 to 81).map(i => f"hog$i%02d") ++
      Seq("rw_power_integral", "rw_power_ratio") ++
      (1 to 50).map(i => f"ring$i%02d") ++
      (1 to 48).map(i => f"wedge$i%02d")

  /** All extended features for one (mask, roi) pair: blob-level stats of
    * the largest blob + roi-level invariant moments / texture / HOG.
    * Key names match the golden fixture / EcoTaxa mapping.
    */
  def compute(mask: Mask, roi: Segmentation.Gray): Map[String, Double] = {
    val blobs = Features.findBlobs(mask)
    require(blobs.nonEmpty, "no blobs")
    compute(mask, roi, blobs.head)
  }

  /** As [[compute]] with the largest blob already labeled — the
    * extractFull path shares one `findBlobs` between the slim and
    * extended kernels instead of labeling the same mask twice per row
    * (round-12 review).
    */
  def compute(mask: Mask, roi: Segmentation.Gray, blob: Mask,
      shared: Option[Features.BlobShared] = None): Map[String, Double] = {
    // reuse the slim kernel's intermediates for the same mask instance
    // (round-12 review): perimeter image + points, the orientation
    // moment pass, and the center+rotate ran twice per row before
    val sh = shared.filter(_.blob eq blob)
    val perimPts = sh.map(_.perimPts).getOrElse(
      Raster.truePoints(Raster.perimeter(blob)))
    val area = blob.count.toDouble
    val equivD = math.sqrt(4.0 * area / math.Pi)
    val (pm, pmed, pskew, pkurt) = perimeterStats(perimPts, equivD)
    val rotated = sh.map(_.rotated).getOrElse(
      BlobGeometry.rotateBlob(blob, BlobGeometry.orientation(blob)))
    val (h180, h90, hflip) = hausdorffSymmetry(rotated)
    val (b180, b90, bflip) = binarySymmetry(rotated)
    val rotArea = rotated.count.toDouble
    val (rh, rw) = blobShape(rotated)
    val phis = invMoments(mask)
    val (tMean, tStd, tSmooth, tThird, tUnif, tEnt) = statxture(texturePixels(roi, mask))
    val hogV = hog(roi)
    val (rwIntegral, rwRatio, wedges, rings) = RingWedge.ringWedge(mask)
    Map(
      "perimeter_mean" -> pm, "perimeter_median" -> pmed,
      "perimeter_skewness" -> pskew, "perimeter_kurtosis" -> pkurt,
      "h180" -> h180, "h90" -> h90, "hflip" -> hflip,
      "b180" -> b180, "b90" -> b90, "bflip" -> bflip,
      "rotated_area" -> rotArea,
      "rotated_bbox_xwidth" -> rw.toDouble,
      "rotated_bbox_ywidth" -> rh.toDouble,
      "rotated_bbox_solidity" -> rotArea / (rw.toDouble * rh),
      "texture_average_gray_level" -> tMean,
      "texture_average_contrast" -> tStd,
      "texture_smoothness" -> tSmooth,
      "texture_third_moment" -> tThird,
      "texture_uniformity" -> tUnif,
      "texture_entropy" -> tEnt) ++
      phis.zipWithIndex.map { case (v, i) => s"moment_invariant${i + 1}" -> v } ++
      hogV.zipWithIndex.map { case (v, i) => f"hog${i + 1}%02d" -> v } ++
      Map("rw_power_integral" -> rwIntegral, "rw_power_ratio" -> rwRatio) ++
      rings.zipWithIndex.map { case (v, i) => f"ring${i + 1}%02d" -> v } ++
      wedges.zipWithIndex.map { case (v, i) => f"wedge${i + 1}%02d" -> v }
  }
}
