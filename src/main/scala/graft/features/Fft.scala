package graft.features

/** Shared exact DFT kernels (numpy conventions: forward unnormalized,
  * inverse scaled by 1/n) — radix-2 for powers of two, Bluestein chirp-z
  * for arbitrary lengths. Used by [[RingWedge]] and [[PhaseCongruency]].
  */
object Fft {

  /** In-place radix-2 complex FFT; n must be a power of two. */
  def fftPow2(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    var j = 0
    for (i <- 0 until n - 1) {
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      var m = n >> 1
      while (m >= 1 && j >= m) { j -= m; m >>= 1 }
      j += m
    }
    var len = 2
    while (len <= n) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var i = 0
      while (i < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(i + k); val ui = im(i + k)
          val vr = re(i + k + len / 2) * cwr - im(i + k + len / 2) * cwi
          val vi = re(i + k + len / 2) * cwi + im(i + k + len / 2) * cwr
          re(i + k) = ur + vr; im(i + k) = ui + vi
          re(i + k + len / 2) = ur - vr; im(i + k + len / 2) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          k += 1
        }
        i += len
      }
      len <<= 1
    }
  }

  /** Memoized Bluestein chirp state per (n, sign): the chirp weights
    * w and the ALREADY-TRANSFORMED filter B = fft(b) depend only on the
    * length and direction, but were recomputed on every call — and
    * PhaseCongruency alone performs ~25·(h+w) DFTs per ROI, each paying
    * n trig pairs plus a size-m fftPow2 for a pure function of (n, sign)
    * (round-12 review: roughly a third of the dominant per-row
    * segmentation cost for non-power-of-two dims). Arrays in the cache
    * are read-only by construction; ConcurrentHashMap because feature
    * extraction runs on all executor threads. Bounded: past the cap new
    * lengths compute uncached (never evict — extraction re-visits the
    * same ROI dims constantly).
    */
  private final case class Chirp(wr: Array[Double], wi: Array[Double],
      m: Int, tbr: Array[Double], tbi: Array[Double])
  private val chirpCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Double), Chirp]()
  private val ChirpCacheMax = 256

  private def chirp(n: Int, sign: Double): Chirp = {
    val key = (n, sign)
    val cached = chirpCache.get(key)
    if (cached != null) return cached
    var m = 1
    while (m < 2 * n - 1) m <<= 1
    val wr = new Array[Double](n); val wi = new Array[Double](n)
    val br = new Array[Double](m); val bi = new Array[Double](m)
    for (k <- 0 until n) {
      val a = math.Pi * ((k.toLong * k) % (2L * n)).toDouble / n
      wr(k) = math.cos(a); wi(k) = -sign * math.sin(a)
      br(k) = wr(k); bi(k) = -wi(k)
      if (k > 0) { br(m - k) = wr(k); bi(m - k) = -wi(k) }
    }
    fftPow2(br, bi, inverse = false)
    val c = Chirp(wr, wi, m, br, bi)
    if (chirpCache.size < ChirpCacheMax) chirpCache.putIfAbsent(key, c)
    c
  }

  /** Arbitrary-length complex DFT (Bluestein); `inverse` applies the
    * numpy 1/n scaling.
    */
  def dft(re: Array[Double], im: Array[Double], inverse: Boolean = false): (Array[Double], Array[Double]) = {
    val n = re.length
    if (n == 1) return (re.clone(), im.clone())
    val (outR, outI) =
      if ((n & (n - 1)) == 0) {
        val r = re.clone(); val i = im.clone()
        fftPow2(r, i, inverse)
        (r, i)
      } else {
        val sign = if (inverse) -1.0 else 1.0
        val ch = chirp(n, sign)
        val m = ch.m
        val ar = new Array[Double](m); val ai = new Array[Double](m)
        for (k <- 0 until n) {
          ar(k) = re(k) * ch.wr(k) - im(k) * ch.wi(k)
          ai(k) = re(k) * ch.wi(k) + im(k) * ch.wr(k)
        }
        fftPow2(ar, ai, inverse = false)
        for (k <- 0 until m) {
          val r = ar(k) * ch.tbr(k) - ai(k) * ch.tbi(k)
          ai(k) = ar(k) * ch.tbi(k) + ai(k) * ch.tbr(k)
          ar(k) = r
        }
        fftPow2(ar, ai, inverse = true)
        val oR = new Array[Double](n); val oI = new Array[Double](n)
        for (k <- 0 until n) {
          val cr = ar(k) / m; val ci = ai(k) / m
          oR(k) = cr * ch.wr(k) - ci * ch.wi(k)
          oI(k) = cr * ch.wi(k) + ci * ch.wr(k)
        }
        (oR, oI)
      }
    if (inverse) {
      var k = 0
      while (k < n) { outR(k) /= n; outI(k) /= n; k += 1 }
    }
    (outR, outI)
  }

  /** 2-D complex DFT, rows then columns. */
  def fft2c(re: Array[Double], im: Array[Double], h: Int, w: Int,
            inverse: Boolean): (Array[Double], Array[Double]) = {
    val r = re.clone(); val i = im.clone()
    for (row <- 0 until h) {
      val (rr, ri) = dft(
        Array.tabulate(w)(j => r(row * w + j)),
        Array.tabulate(w)(j => i(row * w + j)), inverse)
      for (j <- 0 until w) { r(row * w + j) = rr(j); i(row * w + j) = ri(j) }
    }
    for (col <- 0 until w) {
      val (cr, ci) = dft(
        Array.tabulate(h)(row => r(row * w + col)),
        Array.tabulate(h)(row => i(row * w + col)), inverse)
      for (row <- 0 until h) { r(row * w + col) = cr(row); i(row * w + col) = ci(row) }
    }
    (r, i)
  }

  /** Forward 2-D DFT of a real matrix. */
  def fft2(x: Array[Double], h: Int, w: Int): (Array[Double], Array[Double]) =
    fft2c(x, new Array[Double](h * w), h, w, inverse = false)

  /** numpy `fftshift` (zero-frequency to center). */
  def fftshift(x: Array[Double], h: Int, w: Int): Array[Double] = {
    val out = new Array[Double](h * w)
    for (i <- 0 until h; j <- 0 until w)
      out(((i + h / 2) % h) * w + ((j + w / 2) % w)) = x(i * w + j)
    out
  }

  /** numpy `ifftshift` (inverse of [[fftshift]], differs on odd sizes). */
  def ifftshift(x: Array[Double], h: Int, w: Int): Array[Double] = {
    val out = new Array[Double](h * w)
    for (i <- 0 until h; j <- 0 until w)
      out(i * w + j) = x(((i + h / 2) % h) * w + ((j + w / 2) % w))
    out
  }
}
