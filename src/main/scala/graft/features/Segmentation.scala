package graft.features

/** ROI segmentation chain mirroring the reference
  * (`ifcb-features/ifcb_features/segmentation.py`, `morphology.py`):
  * edge detection → hysteresis threshold → border trim → binary closing →
  * LUT thinning → dark-pixel k-means split → hole fill → erosion →
  * blob-min filtering.
  *
  * Edge detection: the reference uses phase congruency
  * (phasecong.py:41-60, via the external phasepack FFT library). The
  * default detector is [[PhaseCongruency.edges]] — Kovesi's published
  * log-Gabor algorithm with the reference's parameters, golden-tested
  * against an independent numpy transcription (see PhaseCongruency's
  * provenance note). [[sobelEdges]] remains as a cheap alternative;
  * any detector plugs in via the `edges` parameter of [[segmentRoi]]
  * without touching the rest of the chain, whose parity is exact.
  */
object Segmentation {

  val HtT1 = 0.3
  val HtT2 = 0.09
  val BlobMin = 40
  val DarkThresholdAdjustment = 0.75

  /** Grayscale image as row-major 0-255 ints. */
  final case class Gray(h: Int, w: Int, data: Array[Int]) {
    @inline def apply(i: Int, j: Int): Int = data(i * w + j)
  }

  /** Normalized Sobel gradient magnitude on roi/255 (float64) — the
    * documented phase-congruency stand-in.
    */
  def sobelEdges(roi: Gray): Array[Double] = {
    val h = roi.h; val w = roi.w
    val kx = Array(Array(-1.0, 0.0, 1.0), Array(-2.0, 0.0, 2.0), Array(-1.0, 0.0, 1.0))
    val ky = Array(Array(-1.0, -2.0, -1.0), Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 1.0))
    val g = new Array[Double](h * w)
    var mx = 0.0
    var i = 0
    while (i < h) {
      var j = 0
      while (j < w) {
        var gx = 0.0; var gy = 0.0
        // kernel-order accumulation matches the golden generator's shim
        var a = -1
        while (a <= 1) {
          var b = -1
          while (b <= 1) {
            val y = i + a; val x = j + b
            val v = if (y >= 0 && y < h && x >= 0 && x < w) roi(y, x) / 255.0 else 0.0
            gx += kx(a + 1)(b + 1) * v
            gy += ky(a + 1)(b + 1) * v
            b += 1
          }
          a += 1
        }
        val m = math.sqrt(gx * gx + gy * gy)
        g(i * w + j) = m
        if (m > mx) mx = m
        j += 1
      }
      i += 1
    }
    if (mx > 0) { var k = 0; while (k < g.length) { g(k) /= mx; k += 1 } }
    g
  }

  /** Hysteresis thresholding (morphology.py:22-36): pixels > T1 seed,
    * 8-connected growth into pixels > T2.
    */
  def hysthresh(img: Array[Double], h: Int, w: Int, t1: Double, t2: Double): Mask = {
    val hi = math.max(t1, t2); val lo = math.min(t1, t2)
    val edges = Mask.empty(h, w)
    val stack = new IntStack()
    var k = 0
    while (k < img.length) {
      if (img(k) > hi) { edges.data(k) = true; stack.push(k) }
      k += 1
    }
    while (!stack.isEmpty) {
      val p = stack.pop()
      val y = p / w; val x = p % w
      var a = -1
      while (a <= 1) {
        var b = -1
        while (b <= 1) {
          val ny = y + a; val nx = x + b
          if (ny >= 0 && ny < h && nx >= 0 && nx < w) {
            val q = ny * w + nx
            if (!edges.data(q) && img(q) > lo) { edges.data(q) = true; stack.push(q) }
          }
          b += 1
        }
        a += 1
      }
    }
    edges
  }

  /** Thinning LUTs generated from the documented G1/G2/G3 condition
    * functions (morphology.py:40-87 comment block — Lam, Lee & Suen
    * thinning). Generating (rather than copying the tables) keeps a
    * single source of truth: the published boolean conditions.
    */
  private def bits(n: Int): Array[Boolean] = Array.tabulate(9)(i => ((n >> i) & 1) == 1)
  private def g1(n: Int): Boolean = {
    val b = bits(n)
    var s = 0
    for (i <- Seq(0, 2, 4, 6)) if (!b(i) && (b(i + 1) || b((i + 2) % 8))) s += 1
    s == 1
  }
  private def g2(n: Int): Boolean = {
    val b = bits(n)
    var n1 = 0; var n2 = 0
    for (k <- Seq(1, 3, 5, 7)) {
      if (b(k) || b(k - 1)) n1 += 1
      if (b(k) || b((k + 1) % 8)) n2 += 1
    }
    val m = math.min(n1, n2)
    m == 2 || m == 3
  }
  private def g3(n: Int): Boolean = {
    val b = bits(n); !((b(1) || b(2) || !b(7)) && b(0))
  }
  private def g3p(n: Int): Boolean = {
    val b = bits(n); !((b(5) || b(6) || !b(3)) && b(4))
  }
  private lazy val lut123: Array[Boolean] =
    Array.tabulate(256)(n => g1(n) && g2(n) && g3(n))
  private lazy val lut123p: Array[Boolean] =
    Array.tabulate(256)(n => g1(n) && g2(n) && g3p(n))

  /** `bwmorph_thin` (morphology.py:115-125): two LUT sub-iterations per
    * round over the 8-neighborhood code.
    */
  def thin(m: Mask, nIter: Int): Mask = {
    // neighbor bit weights at offsets, per the correlate mask
    // [[8,4,2],[16,0,1],[32,64,128]]
    val offs = Array(
      ((-1, -1), 8), ((-1, 0), 4), ((-1, 1), 2),
      ((0, -1), 16), ((0, 1), 1),
      ((1, -1), 32), ((1, 0), 64), ((1, 1), 128))
    var cur = m.copyMask
    for (_ <- 0 until nIter; lut <- Seq(lut123, lut123p)) {
      val codes = new Array[Int](cur.h * cur.w)
      for (i <- 0 until cur.h; j <- 0 until cur.w) {
        var code = 0
        for (((di, dj), wgt) <- offs) {
          val y = i + di; val x = j + dj
          if (y >= 0 && y < cur.h && x >= 0 && x < cur.w && cur(y, x)) code += wgt
        }
        codes(i * cur.w + j) = code
      }
      val next = cur.copyMask
      var k = 0
      while (k < codes.length) {
        if (lut(codes(k))) next.data(k) = false
        k += 1
      }
      cur = next
    }
    cur
  }

  /** MATLAB-style strict batch 1-D k-means with singleton empty-cluster
    * handling (segmentation.py:20-115). Float32 throughout, sequential
    * float32 sums, argmin ties to the lower index, moves only on strict
    * improvement — all required for bit parity with the reference.
    * Returns (centers, assignment).
    */
  def kmeans1dStrict(values: Array[Float], maxIter: Int = 100): (Array[Float], Array[Byte]) = {
    val n = values.length
    val centers = Array(0.0f, 1.0f)
    if (n == 0) return (centers, new Array[Byte](0))
    // a single point cannot populate two clusters: the empty-cluster
    // donation scan below would search for a member of the other
    // cluster and run off the end of idx (round-11 review)
    if (n == 1) return (Array(values(0), values(0)), Array[Byte](0))
    val dist = Array.ofDim[Float](2, n)
    def distTo(c: Int): Unit = {
      val cv = centers(c)
      var i = 0
      while (i < n) { val d = values(i) - cv; dist(c)(i) = d * d; i += 1 }
    }
    def centerFor(idx: Array[Byte], c: Int): (Float, Int) = {
      var total = 0.0f; var count = 0
      var i = 0
      while (i < n) {
        if (idx(i) == c) { total = total + values(i); count += 1 }
        i += 1
      }
      if (count == 0) (Float.NaN, 0) else (total / count.toFloat, count)
    }
    def assignedTotal(idx: Array[Byte]): Float = {
      var total = 0.0f
      var i = 0
      while (i < n) { total = total + dist(idx(i))(i); i += 1 }
      total
    }
    distTo(0); distTo(1)
    val idx = new Array[Byte](n)
    var i = 0
    while (i < n) { idx(i) = if (dist(1)(i) < dist(0)(i)) 1 else 0; i += 1 }

    var changed: Set[Int] = Set(0, 1)
    var previdx = new Array[Byte](n)
    var prevTot = Float.PositiveInfinity
    val counts = new Array[Int](2)

    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      counts(0) = 0; counts(1) = 0
      i = 0
      while (i < n) { counts(idx(i)) += 1; i += 1 }
      for (c <- changed.toSeq.sorted if counts(c) > 0) {
        val (cv, cnt) = centerFor(idx, c)
        centers(c) = cv; counts(c) = cnt
      }
      for (c <- changed.toSeq.sorted) distTo(c)
      val empties = changed.toSeq.sorted.filter(counts(_) == 0)
      for (empty <- empties) {
        // donate the point farthest from its current center
        var lonely = 0; var best = Float.NegativeInfinity
        i = 0
        while (i < n) {
          val d = dist(idx(i))(i)
          if (d > best) { best = d; lonely = i }
          i += 1
        }
        var from = idx(lonely).toInt
        if (counts(from) < 2) {
          from = if (counts(0) > 1) 0 else 1
          var f = 0
          while (idx(f) != from) f += 1
          lonely = f
        }
        centers(empty) = values(lonely)
        idx(lonely) = empty.toByte
        counts(empty) = 1
        counts(from) -= 1
        distTo(empty)
        if (counts(from) > 0) {
          val (cv, cnt) = centerFor(idx, from)
          centers(from) = cv; counts(from) = cnt
        }
        distTo(from)
        changed = changed + from
      }
      val tot = assignedTotal(idx)
      if (prevTot <= tot) {
        System.arraycopy(previdx, 0, idx, 0, n)
        counts(0) = 0; counts(1) = 0
        i = 0
        while (i < n) { counts(idx(i)) += 1; i += 1 }
        for (c <- changed.toSeq.sorted if counts(c) > 0) {
          val (cv, cnt) = centerFor(idx, c)
          centers(c) = cv; counts(c) = cnt
        }
        done = true
      } else {
        previdx = idx.clone()
        prevTot = tot
        var anyMoved = false
        val movedNew = scala.collection.mutable.Set.empty[Int]
        val movedOld = scala.collection.mutable.Set.empty[Int]
        i = 0
        while (i < n) {
          val ni: Byte = if (dist(1)(i) < dist(0)(i)) 1 else 0
          if (ni != previdx(i) && dist(previdx(i))(i) > dist(ni)(i)) {
            idx(i) = ni
            movedNew += ni.toInt
            movedOld += previdx(i).toInt
            anyMoved = true
          }
          i += 1
        }
        if (!anyMoved) done = true
        else changed = (movedNew ++ movedOld).toSet
      }
      iter += 1
    }
    (centers, idx)
  }

  /** Background/foreground split (`kmeans_segment`, segmentation.py:
    * 117-139): 1-D k-means over column-major roi/255 values, background =
    * brighter cluster extended by 0.75x its darkest member.
    */
  def kmeansSegment(roi: Gray): Mask = {
    val h = roi.h; val w = roi.w
    // column-major value order (MATLAB img(:) traversal)
    val values = new Array[Float](h * w)
    var k = 0
    var j = 0
    while (j < w) {
      var i = 0
      while (i < h) { values(k) = roi(i, j) / 255.0f; k += 1; i += 1 }
      j += 1
    }
    val (centers, idxColMajor) = kmeans1dStrict(values)
    val bg: Byte = if (centers(1) > centers(0)) 1 else 0
    var darkest = Float.PositiveInfinity
    k = 0
    while (k < values.length) {
      if (idxColMajor(k) == bg && values(k) < darkest) darkest = values(k)
      k += 1
    }
    val threshold = darkest.toDouble * DarkThresholdAdjustment
    val out = Mask.empty(h, w)
    k = 0
    j = 0
    while (j < w) {
      var i = 0
      while (i < h) {
        val isBg = idxColMajor(k) == bg || values(k).toDouble > threshold
        out.set(i, j, !isBg)
        k += 1; i += 1
      }
      j += 1
    }
    out
  }

  /** `bwareaopen`-style small-blob removal (segmentation.py:142-154):
    * keep 8-connected components of at least BlobMin+1 = 41 pixels.
    */
  def applyBlobMin(m: Mask): Mask = {
    val (lab, n) = Raster.label(m, conn8 = true)
    if (n == 0) return m.copyMask
    val counts = new Array[Int](n + 1)
    var k = 0
    while (k < lab.length) { counts(lab(k)) += 1; k += 1 }
    val out = Mask.empty(m.h, m.w)
    k = 0
    while (k < lab.length) {
      out.data(k) = lab(k) > 0 && counts(lab(k)) >= BlobMin + 1
      k += 1
    }
    out
  }

  /** Full chain (`segment_roi`, segmentation.py:156-186). `edges`
    * defaults to phase congruency like the reference (see object docs).
    */
  def segmentRoi(roi: Gray, edges: Gray => Array[Double] = PhaseCongruency.edges): Mask = {
    val h = roi.h; val w = roi.w
    // degenerate rasters (a corrupt ADC row can claim width/height 1;
    // RoiSource only filters <= 0): the border trim below indexes
    // col w-2 / row h-2, which for w or h < 2 reads out of bounds —
    // and a 1-pixel-anything ROI has no segmentable content anyway, so
    // return the empty mask instead of crashing the executor task
    // (round-11 review; Features.compute handles zero blobs)
    if (h < 2 || w < 2) return Mask.empty(h, w)
    var b = hysthresh(edges(roi), h, w, HtT1, HtT2)
    // trim pixels off the border (segmentation.py:167-170), in order:
    // left col, right col, top row, bottom row — each sees prior updates
    for (i <- 0 until h) if (!b(i, 1)) b.set(i, 0, false)
    for (i <- 0 until h) if (!b(i, w - 2)) b.set(i, w - 1, false)
    for (j <- 0 until w) if (!b(1, j)) b.set(0, j, false)
    for (j <- 0 until w) if (!b(h - 2, j)) b.set(h - 1, j, false)
    b = Raster.crop(Raster.close(Raster.pad(b, 2), Raster.diamond(2)), 2)
    b = thin(b, 3)
    val dark = kmeansSegment(roi)
    val merged = Mask.empty(h, w)
    var k = 0
    while (k < merged.data.length) {
      merged.data(k) = b.data(k) || dark.data(k)
      k += 1
    }
    b = Raster.fillHoles(merged)
    val eroded = Raster.erode(b, Raster.diamond(1))
    // bind the filtered eroded mask once: the previous guard recomputed
    // the identical applyBlobMin (a full labeling pass) on the taken
    // branch — per ROI, on the extraction hot path (round-12 review)
    val kept = applyBlobMin(eroded)
    if (kept.count > 0) kept else applyBlobMin(b)
  }
}
