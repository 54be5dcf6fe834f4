package graft.features

/** Ring/wedge power-spectrum features (reference:
  * `ifcb-features/ifcb_features/ringwedge.py`, MATLAB original by
  * Kaccie Li 2005): the 2-D power spectrum of the blob mask, endpoint-
  * aligned-bilinear resampled to 301x301, integrated over 50 concentric
  * ring masks and 48 bottom-half wedge masks, normalized by the wedge
  * power integral.
  *
  * The FFT is an exact DFT via the Bluestein chirp-z transform (any
  * image size), matching numpy's unnormalized forward convention to
  * ~1e-12 relative. The `scipy.ndimage.zoom(order=1, mode='nearest')`
  * resample is mirrored as endpoint-aligned bilinear interpolation —
  * identical math in the golden generator's shim.
  */
object RingWedge {

  val Dim = 301
  val NRings = 50
  val NWedges = 48

  // DFT kernels live in [[Fft]] (shared with PhaseCongruency)
  def fft2(x: Array[Double], h: Int, w: Int): (Array[Double], Array[Double]) =
    Fft.fft2(x, h, w)

  def fftshift(x: Array[Double], h: Int, w: Int): Array[Double] =
    Fft.fftshift(x, h, w)

  /** Endpoint-aligned bilinear resize (the golden generator's zoom
    * semantics: out endpoint = in endpoint).
    */
  def bilinearZoom(img: Array[Double], ih: Int, iw: Int, oh: Int, ow: Int): Array[Double] = {
    val out = new Array[Double](oh * ow)
    val ry = if (oh > 1) (ih - 1).toDouble / (oh - 1) else 0.0
    val rx = if (ow > 1) (iw - 1).toDouble / (ow - 1) else 0.0
    for (i <- 0 until oh) {
      val y = i * ry
      val y0 = y.toInt
      val y1 = math.min(y0 + 1, ih - 1)
      val fy = y - y0
      for (j <- 0 until ow) {
        val x = j * rx
        val x0 = x.toInt
        val x1 = math.min(x0 + 1, iw - 1)
        val fx = x - x0
        out(i * ow + j) =
          img(y0 * iw + x0) * (1 - fy) * (1 - fx) +
            img(y0 * iw + x1) * (1 - fy) * fx +
            img(y1 * iw + x0) * fy * (1 - fx) +
            img(y1 * iw + x1) * fy * fx
      }
    }
    out
  }

  // --- masks (ringwedge.py:20-76), computed once per JVM -------------------

  /** numpy `linspace` bit-exact: value = start + k·step with
    * step = (stop-start)/(num-1) rounded once, endpoint forced — mask
    * boundaries (th == 3π/4 on the anti-diagonal) depend on these bits.
    */
  private def linspace(start: Double, stop: Double, num: Int): Array[Double] = {
    val step = (stop - start) / (num - 1)
    val out = Array.tabulate(num)(k => start + k * step)
    out(num - 1) = stop
    out
  }

  private lazy val unitCircle: (Array[Double], Array[Double]) = {
    val i0 = linspace(-1.0, 1.0, Dim)
    val r = new Array[Double](Dim * Dim)
    val th = new Array[Double](Dim * Dim)
    for (i <- 0 until Dim; j <- 0 until Dim) {
      val x = i0(j); val y = i0(i)
      r(i * Dim + j) = math.sqrt(x * x + y * y)
      th(i * Dim + j) = math.atan2(y, x)
    }
    (r, th)
  }

  private lazy val ringMasks: Array[Array[Boolean]] = {
    val c = Dim / 2
    val df = (1.0 / Dim) * (1.0 / 6.45)
    // f = linspace(-0.5/6.45, 0.5/6.45, Dim+1)[:Dim]
    val f = linspace(-0.5 / 6.45, 0.5 / 6.45, Dim + 1).take(Dim)
    Array.tabulate(NRings) { ri =>
      val inner = (ri / (NRings - 1.0)) * (c - 3) * df
      val outer = inner + 3 * df
      val m = new Array[Boolean](Dim * Dim)
      for (i <- 0 until Dim; j <- 0 until Dim) {
        val x = f(j); val y = f(i)
        val r = math.sqrt(x * x + y * y)
        m(i * Dim + j) = r > inner && r < outer
      }
      m
    }
  }

  private lazy val wedgeMasks: Array[Array[Boolean]] = {
    val (r, th) = unitCircle
    Array.tabulate(NWedges) { wi =>
      val lo = wi * math.Pi / NWedges
      val hi = (wi + 1) * math.Pi / NWedges
      val m = new Array[Boolean](Dim * Dim)
      for (k <- 0 until Dim * Dim)
        m(k) = r(k) <= 1 && th(k) > lo && th(k) <= hi
      // correct the vertical-strip error on the middle wedge
      if (wi == NWedges / 2 - 1)
        for (k <- 0 until Dim * Dim)
          if (th(k) == math.Pi / 2) m(k) = !m(k)
      m
    }
  }

  private lazy val centerMask: Array[Boolean] = {
    val df = (1.0 / (Dim - 1)) / 6.45
    val i0 = linspace(-0.5 / 6.45, 0.5 / 6.45, Dim)
    val m = new Array[Boolean](Dim * Dim)
    for (i <- 0 until Dim; j <- 0 until Dim) {
      val x = i0(i); val y = i0(j)
      m(i * Dim + j) = math.sqrt(x * x + y * y) <= 15 * df
    }
    m
  }

  /** CSR-packed per-pixel membership lists derived from the boolean
    * masks (round-12 review): the accumulation loop probed all 98
    * masks per bottom-half pixel (~4.4M boolean tests per ROI on the
    * extractFull hot path) where almost every pixel belongs to at most
    * one wedge and one-or-two rings. Derived FROM the masks — not
    * re-derived from the geometry — so membership is exactly the
    * masks', including the boundary pixels adjacent rings can share in
    * the last ulp, and the per-(mask, pixel) addition order below is
    * unchanged → bit-identical sums vs the golden kernel.
    */
  private def csr(masks: Array[Array[Boolean]]): (Array[Int], Array[Int]) = {
    val n = Dim * Dim
    val off = new Array[Int](n + 1)
    var k = 0
    while (k < n) {
      var c = 0; var m = 0
      while (m < masks.length) { if (masks(m)(k)) c += 1; m += 1 }
      off(k + 1) = off(k) + c
      k += 1
    }
    val hits = new Array[Int](off(n))
    val cur = off.clone()
    var m = 0
    while (m < masks.length) {
      var kk = 0
      while (kk < n) {
        if (masks(m)(kk)) { hits(cur(kk)) = m; cur(kk) += 1 }
        kk += 1
      }
      m += 1
    }
    (off, hits)
  }

  private lazy val (wedgeOff, wedgeHits) = csr(wedgeMasks)
  private lazy val (ringOff, ringHits) = csr(ringMasks)

  /** (power integral, center/total power ratio, 48 wedges, 50 rings) —
    * `ring_wedge` (ringwedge.py:78-109) over the blob mask.
    */
  def ringWedge(mask: Mask): (Double, Double, Array[Double], Array[Double]) = {
    val h = mask.h; val w = mask.w
    val img = Array.tabulate(h * w)(k => if (mask.data(k)) 1.0 else 0.0)
    val (fr, fi) = fft2(img, h, w)
    val power = Array.tabulate(h * w)(k => fr(k) * fr(k) + fi(k) * fi(k))
    val shifted = fftshift(power, h, w)
    val it = bilinearZoom(shifted, h, w, Dim, Dim)
    var innerInt = 0.0; var totalInt = 0.0
    for (k <- 0 until Dim * Dim) {
      totalInt += it(k)
      if (centerMask(k)) innerInt += it(k)
    }
    val pwrRatio = innerInt / totalInt
    // bottom half: rows Dim/2+1 .. Dim-1
    val halfStart = (Dim / 2 + 1) * Dim
    val wedgeVec = new Array[Double](NWedges)
    val ringVec = new Array[Double](NRings)
    for (k <- halfStart until Dim * Dim) {
      val v = it(k)
      if (!centerMask(k)) {
        var p = wedgeOff(k); val e = wedgeOff(k + 1)
        while (p < e) { wedgeVec(wedgeHits(p)) += v; p += 1 }
      }
      var p = ringOff(k); val e = ringOff(k + 1)
      while (p < e) { ringVec(ringHits(p)) += v; p += 1 }
    }
    val pwrIntegral = wedgeVec.sum
    (pwrIntegral, pwrRatio,
      wedgeVec.map(_ / pwrIntegral), ringVec.map(_ / pwrIntegral))
  }
}
