package graft.features

/** Phase congruency edge/feature detector — Peter Kovesi's published
  * log-Gabor algorithm (`phasecong3.m` / the phasepack port the
  * reference wraps at ifcb-features phasecong.py:41-60), computing the
  * min/max covariance moments M, m with the reference's IFCB parameters
  * (4 scales, 6 orientations, minWaveLength 2, mult 2.5, sigmaOnf 0.55,
  * k 2.0, cutOff 0.3, g 5, noiseMethod -1).
  *
  * Returned as M + m — the edge+corner map [[Segmentation.segmentRoi]]
  * thresholds.
  *
  * Provenance: implemented from the published algorithm and
  * golden-tested against an independent numpy transcription of the same
  * (tools/golden_features.py) — NOT bit-verified against the phasepack
  * binary, which is unavailable offline; the algorithmic structure
  * (log-Gabor bank, phase-deviation energy, Rayleigh noise threshold,
  * frequency-spread weighting, covariance moments) follows the public
  * description.
  */
object PhaseCongruency {

  val NScale = 4
  val NOrient = 6
  val MinWaveLength = 2.0
  val Mult = 2.5
  val SigmaOnf = 0.55
  val K = 2.0
  val CutOff = 0.3
  val G = 5.0
  private val Eps = 1e-4 // Kovesi's epsilon guard

  /** The pure function-of-(h, w) filter bank: log-Gabor radial filters
    * and per-orientation angular spreads. Built once per raster shape
    * and memoized ([[bank]]) — extraction re-visits the same ROI dims
    * constantly (the Fft chirp-cache observation), and rebuilding this
    * per ROI was ~(NScale + NOrient + 4)·h·w transcendental
    * evaluations on the dominant per-row cost path (round-12 review).
    * Arrays are read-only by construction.
    */
  private final case class FilterBank(
      logGabor: Array[Array[Double]], spread: Array[Array[Double]])

  private val BankCacheMax = 64
  // entry COUNT alone is not a memory bound: each bank retains
  // (NScale + NOrient)·h·w doubles for the JVM's life, so 64 large-ROI
  // shapes could pin GBs of executor heap (round-12 ADVICE). Cap total
  // cached elements too — typical ROI shapes (~10^4 px → ~100k doubles
  // per bank) stay far under both bounds; an oversized shape simply
  // rebuilds its bank per call, the pre-cache behavior.
  private val BankCacheMaxElems = 16L << 20 // 16M doubles ≈ 128 MB
  private val bankCacheElems = new java.util.concurrent.atomic.AtomicLong()
  private val bankCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), FilterBank]()

  private def bank(h: Int, w: Int): FilterBank = {
    val key = (h, w)
    val cached = bankCache.get(key)
    if (cached != null) return cached
    val n = h * w
    // normalized frequency grids (phasecong3: fftshifted ranges then
    // ifftshift), radius(0,0) = 1 to avoid log(0)
    val xr = if (w % 2 == 1) Array.tabulate(w)(j => (j - (w - 1) / 2).toDouble / (w - 1))
             else Array.tabulate(w)(j => (j - w / 2).toDouble / w)
    val yr = if (h % 2 == 1) Array.tabulate(h)(i => (i - (h - 1) / 2).toDouble / (h - 1))
             else Array.tabulate(h)(i => (i - h / 2).toDouble / h)
    val radius = new Array[Double](n)
    val sinT = new Array[Double](n)
    val cosT = new Array[Double](n)
    for (i <- 0 until h; j <- 0 until w) {
      val x = xr(j); val y = yr(i)
      val r = math.sqrt(x * x + y * y)
      val th = math.atan2(-y, x)
      radius(i * w + j) = r
      sinT(i * w + j) = math.sin(th)
      cosT(i * w + j) = math.cos(th)
    }
    val radiusU = Fft.ifftshift(radius, h, w)
    val sinU = Fft.ifftshift(sinT, h, w)
    val cosU = Fft.ifftshift(cosT, h, w)
    radiusU(0) = 1.0

    // low-pass filter (lowpassfilter.m: cutoff .45, order 15); its DC
    // value is irrelevant — logGabor's DC entry is forced to 0 below
    val lp = radiusU.map(r => 1.0 / (1.0 + math.pow(r / 0.45, 30.0)))
    val logGabor = Array.tabulate(NScale) { s =>
      val fo = 1.0 / (MinWaveLength * math.pow(Mult, s))
      val den = 2.0 * math.pow(math.log(SigmaOnf), 2)
      val gab = Array.tabulate(n) { k =>
        val v = math.exp(-math.pow(math.log(radiusU(k) / fo), 2) / den) * lp(k)
        v
      }
      gab(0) = 0.0
      gab
    }
    val spread = Array.tabulate(NOrient) { o =>
      val angl = o * math.Pi / NOrient
      val ca = math.cos(angl); val sa = math.sin(angl)
      Array.tabulate(n) { k =>
        val ds = sinU(k) * ca - cosU(k) * sa
        val dc = cosU(k) * ca + sinU(k) * sa
        val dtheta = math.min(math.abs(math.atan2(ds, dc)) * NOrient / 2.0, math.Pi)
        (math.cos(dtheta) + 1.0) / 2.0
      }
    }
    val b = FilterBank(logGabor, spread)
    // concurrent inserts can overshoot the element cap by at most one
    // entry (the counter moves only for the putIfAbsent winner)
    val entryElems = (NScale + NOrient).toLong * n
    if (bankCache.size < BankCacheMax &&
        bankCacheElems.get + entryElems <= BankCacheMaxElems &&
        bankCache.putIfAbsent(key, b) == null)
      bankCacheElems.addAndGet(entryElems)
    b
  }

  /** (M, m) covariance moment maps for a grayscale image. */
  def moments(img: Array[Double], h: Int, w: Int): (Array[Double], Array[Double]) = {
    val n = h * w
    val (imR, imI) = Fft.fft2(img, h, w)
    val fb = bank(h, w)
    val logGabor = fb.logGabor

    val covx2 = new Array[Double](n)
    val covy2 = new Array[Double](n)
    val covxy = new Array[Double](n)

    for (o <- 0 until NOrient) {
      val angl = o * math.Pi / NOrient
      val ca = math.cos(angl); val sa = math.sin(angl)
      val spread = fb.spread(o)
      val eoR = Array.ofDim[Double](NScale, n)
      val eoI = Array.ofDim[Double](NScale, n)
      val sumE = new Array[Double](n)
      val sumO = new Array[Double](n)
      val sumAn = new Array[Double](n)
      val maxAn = new Array[Double](n)
      var tau = 0.0
      for (s <- 0 until NScale) {
        val fr = new Array[Double](n)
        val fi = new Array[Double](n)
        for (k <- 0 until n) {
          val f = logGabor(s)(k) * spread(k)
          fr(k) = imR(k) * f
          fi(k) = imI(k) * f
        }
        val (er, ei) = Fft.fft2c(fr, fi, h, w, inverse = true)
        for (k <- 0 until n) {
          eoR(s)(k) = er(k); eoI(s)(k) = ei(k)
          val an = math.sqrt(er(k) * er(k) + ei(k) * ei(k))
          sumAn(k) += an
          sumE(k) += er(k)
          sumO(k) += ei(k)
          if (s == 0) maxAn(k) = an
          else if (an > maxAn(k)) maxAn(k) = an
        }
        if (s == 0) {
          // noiseMethod -1: tau from the median amplitude (Rayleigh)
          val sorted = Array.tabulate(n)(k =>
            math.sqrt(eoR(0)(k) * eoR(0)(k) + eoI(0)(k) * eoI(0)(k))).sorted
          val med = if (n % 2 == 1) sorted(n / 2)
                    else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
          tau = med / math.sqrt(math.log(4.0))
        }
      }
      val energy = new Array[Double](n)
      for (k <- 0 until n) {
        val x = math.sqrt(sumE(k) * sumE(k) + sumO(k) * sumO(k)) + Eps
        val meanE = sumE(k) / x; val meanO = sumO(k) / x
        var e = 0.0
        for (s <- 0 until NScale) {
          val er = eoR(s)(k); val oi = eoI(s)(k)
          e += er * meanE + oi * meanO - math.abs(er * meanO - oi * meanE)
        }
        energy(k) = e
      }
      // Rayleigh-statistics noise threshold over the scale sum
      val totalTau = tau * (1.0 - math.pow(1.0 / Mult, NScale)) / (1.0 - 1.0 / Mult)
      val noiseMean = totalTau * math.sqrt(math.Pi / 2.0)
      val noiseSigma = totalTau * math.sqrt((4.0 - math.Pi) / 2.0)
      val t = noiseMean + K * noiseSigma
      for (k <- 0 until n) {
        val e = math.max(energy(k) - t, 0.0)
        // frequency-spread weighting
        val width = (sumAn(k) / (maxAn(k) + Eps) - 1.0) / (NScale - 1)
        val weight = 1.0 / (1.0 + math.exp(G * (CutOff - width)))
        val pc = weight * e / sumAn(k)
        val cx = pc * ca; val cy = pc * sa
        covx2(k) += cx * cx
        covy2(k) += cy * cy
        covxy(k) += cx * cy
      }
    }
    val mOut = new Array[Double](n)
    val mnOut = new Array[Double](n)
    for (k <- 0 until n) {
      val x2 = covx2(k) / (NOrient / 2.0)
      val y2 = covy2(k) / (NOrient / 2.0)
      val xy = covxy(k) * 4.0 / NOrient
      val denom = math.sqrt(xy * xy + (x2 - y2) * (x2 - y2)) + Eps
      mOut(k) = (y2 + x2 + denom) / 2.0
      mnOut(k) = (y2 + x2 - denom) / 2.0
    }
    (mOut, mnOut)
  }

  /** `phasecong_Mm` (phasecong.py:41-60): M + m over roi pixel values. */
  def edges(roi: Segmentation.Gray): Array[Double] = {
    val img = roi.data.map(_.toDouble)
    val (m, mn) = moments(img, roi.h, roi.w)
    Array.tabulate(img.length)(k => m(k) + mn(k))
  }
}
