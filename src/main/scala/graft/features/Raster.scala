package graft.features

/** Dense binary mask with (row, col) addressing — the pixel substrate for
  * the feature-extraction kernel (reference: ifcb-features
  * `morphology.py`, `blobs.py`). Executor-side only: every operation is a
  * tight loop over a primitive array, no Spark types.
  */
final case class Mask(h: Int, w: Int, data: Array[Boolean]) {
  @inline def apply(i: Int, j: Int): Boolean = data(i * w + j)
  @inline def set(i: Int, j: Int, v: Boolean): Unit = data(i * w + j) = v
  def count: Int = { var n = 0; var k = 0; while (k < data.length) { if (data(k)) n += 1; k += 1 }; n }
  def copyMask: Mask = Mask(h, w, data.clone())
}

object Mask {
  def empty(h: Int, w: Int): Mask = Mask(h, w, new Array[Boolean](h * w))
  def from(rows: Seq[String]): Mask = {
    val h = rows.size; val w = if (h == 0) 0 else rows.head.length
    val d = new Array[Boolean](h * w)
    for (i <- 0 until h; j <- 0 until w) d(i * w + j) = rows(i).charAt(j) == '1'
    Mask(h, w, d)
  }
}

/** Primitive int stack for the flood fills: java.util.ArrayDeque boxes
  * every pushed pixel index into an Integer, one short-lived heap
  * object per pixel visit on the per-row kernel hot path (round-11
  * review). Each pixel is marked before push, so the mask size bounds
  * the depth; the array grows geometrically from a small start.
  */
private[features] final class IntStack(initialCap: Int = 256) {
  private var a = new Array[Int](math.max(initialCap, 16))
  private var n = 0
  def push(v: Int): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
    a(n) = v; n += 1
  }
  def pop(): Int = { n -= 1; a(n) }
  def isEmpty: Boolean = n == 0
}

/** Raster primitives mirroring the reference's scipy/skimage usage
  * (`ifcb-features/ifcb_features/morphology.py:12-20`, `blobs.py:7-30`,
  * `biovolume.py:62-64`): 4/8-connected labeling, exact euclidean
  * distance transform (Felzenszwalb-Huttenlocher — same exact distances
  * as scipy's EDT), hole filling, and binary morphology with skimage
  * border semantics (out-of-bounds false for dilation, true for erosion).
  */
object Raster {

  /** Row-major (i, j) coordinates of the true cells of a perimeter
    * mask — ONE source (round-13 review: the identical comprehension
    * lived in three call sites, and subsampleDist's tie behavior
    * depends on this ordering staying consistent everywhere).
    */
  def truePoints(mask: Mask): Array[(Int, Int)] =
    (for (i <- 0 until mask.h; j <- 0 until mask.w if mask(i, j))
      yield (i, j)).toArray

  /** Structuring element as (di, dj) offsets with center (cy, cx). */
  final case class Selem(offsets: Array[(Int, Int)])

  /** L1 ball of radius r (skimage `diamond`). */
  def diamond(r: Int): Selem = Selem(
    (for (di <- -r to r; dj <- -r to r if math.abs(di) + math.abs(dj) <= r)
      yield (di, dj)).toArray)

  val eight: Selem = Selem(
    (for (di <- -1 to 1; dj <- -1 to 1) yield (di, dj)).toArray)

  def dilate(m: Mask, se: Selem): Mask = {
    val out = Mask.empty(m.h, m.w)
    var i = 0
    while (i < m.h) {
      var j = 0
      while (j < m.w) {
        var hit = false
        val offs = se.offsets
        var k = 0
        while (!hit && k < offs.length) {
          val (di, dj) = offs(k)
          val y = i - di; val x = j - dj
          if (y >= 0 && y < m.h && x >= 0 && x < m.w && m(y, x)) hit = true
          k += 1
        }
        out.set(i, j, hit)
        j += 1
      }
      i += 1
    }
    out
  }

  def erode(m: Mask, se: Selem): Mask = {
    val out = Mask.empty(m.h, m.w)
    var i = 0
    while (i < m.h) {
      var j = 0
      while (j < m.w) {
        var all = true
        val offs = se.offsets
        var k = 0
        while (all && k < offs.length) {
          val (di, dj) = offs(k)
          val y = i + di; val x = j + dj
          // out-of-bounds counts as foreground (skimage erosion semantics)
          if (y >= 0 && y < m.h && x >= 0 && x < m.w && !m(y, x)) all = false
          k += 1
        }
        out.set(i, j, all)
        j += 1
      }
      i += 1
    }
    out
  }

  def close(m: Mask, se: Selem): Mask = erode(dilate(m, se), se)

  def pad(m: Mask, p: Int): Mask = {
    val out = Mask.empty(m.h + 2 * p, m.w + 2 * p)
    for (i <- 0 until m.h; j <- 0 until m.w) out.set(i + p, j + p, m(i, j))
    out
  }

  def crop(m: Mask, p: Int): Mask = {
    val out = Mask.empty(m.h - 2 * p, m.w - 2 * p)
    for (i <- 0 until out.h; j <- 0 until out.w) out.set(i, j, m(i + p, j + p))
    out
  }

  /** Blob boundary via the 4-connected laplacian (`find_perimeter`,
    * morphology.py:12-20): pixel is on the perimeter iff set and not all
    * of its in-bounds 4-neighbors are set.
    */
  def perimeter(m: Mask): Mask = {
    val out = Mask.empty(m.h, m.w)
    var i = 0
    while (i < m.h) {
      var j = 0
      while (j < m.w) {
        if (m(i, j)) {
          var s = 4
          if (i > 0 && m(i - 1, j)) s -= 1
          if (i < m.h - 1 && m(i + 1, j)) s -= 1
          if (j > 0 && m(i, j - 1)) s -= 1
          if (j < m.w - 1 && m(i, j + 1)) s -= 1
          out.set(i, j, s > 0)
        }
        j += 1
      }
      i += 1
    }
    out
  }

  /** Connected components (labels in raster-scan discovery order).
    * @param conn8 eight-connectivity when true, four otherwise
    */
  def label(m: Mask, conn8: Boolean): (Array[Int], Int) = {
    val lab = new Array[Int](m.h * m.w)
    val nbrs = if (conn8) Array((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
               else Array((-1, 0), (1, 0), (0, -1), (0, 1))
    var next = 0
    val stack = new IntStack()
    var i = 0
    while (i < m.h) {
      var j = 0
      while (j < m.w) {
        if (m(i, j) && lab(i * m.w + j) == 0) {
          next += 1
          lab(i * m.w + j) = next
          stack.push(i * m.w + j)
          while (!stack.isEmpty) {
            val p = stack.pop()
            val y = p / m.w; val x = p % m.w
            var k = 0
            while (k < nbrs.length) {
              val (dy, dx) = nbrs(k)
              val ny = y + dy; val nx = x + dx
              if (ny >= 0 && ny < m.h && nx >= 0 && nx < m.w &&
                  m(ny, nx) && lab(ny * m.w + nx) == 0) {
                lab(ny * m.w + nx) = next
                stack.push(ny * m.w + nx)
              }
              k += 1
            }
          }
        }
        j += 1
      }
      i += 1
    }
    (lab, next)
  }

  /** Fill enclosed background (`binary_fill_holes`, 4-connected flood from
    * the border — scipy's default structure).
    */
  def fillHoles(m: Mask): Mask = {
    val reach = Mask.empty(m.h, m.w)
    val stack = new IntStack()
    def push(i: Int, j: Int): Unit =
      if (!m(i, j) && !reach(i, j)) { reach.set(i, j, true); stack.push(i * m.w + j) }
    for (i <- 0 until m.h) { push(i, 0); push(i, m.w - 1) }
    for (j <- 0 until m.w) { push(0, j); push(m.h - 1, j) }
    while (!stack.isEmpty) {
      val p = stack.pop()
      val y = p / m.w; val x = p % m.w
      if (y > 0) push(y - 1, x)
      if (y < m.h - 1) push(y + 1, x)
      if (x > 0) push(y, x - 1)
      if (x < m.w - 1) push(y, x + 1)
    }
    val out = Mask.empty(m.h, m.w)
    for (i <- 0 until m.h; j <- 0 until m.w)
      out.set(i, j, m(i, j) || !reach(i, j))
    out
  }

  /** Exact squared euclidean distance transform to the nearest `site`
    * pixel (Felzenszwalb & Huttenlocher 2004, two-pass 1D lower
    * envelopes). Exact like scipy's `distance_transform_edt`: squared
    * distances are integers, so sqrt agrees bit-for-bit.
    */
  def edt2(site: Mask): Array[Double] = {
    val h = site.h; val w = site.w
    val INF = 1e20
    val g = new Array[Double](h * w)
    // pass 1: per-column 1D distance (vertical)
    var j = 0
    while (j < w) {
      var prev = INF
      var i = 0
      while (i < h) { // down
        prev = if (site(i, j)) 0.0 else prev + 1.0
        g(i * w + j) = prev
        i += 1
      }
      prev = INF
      i = h - 1
      while (i >= 0) { // up
        prev = math.min(g(i * w + j), prev + 1.0)
        g(i * w + j) = prev
        i -= 1
      }
      // store squared vertical distances
      i = 0
      while (i < h) {
        val v = g(i * w + j)
        g(i * w + j) = if (v >= INF) INF else v * v
        i += 1
      }
      j += 1
    }
    // pass 2: per-row lower envelope of parabolas
    val out = new Array[Double](h * w)
    val vIdx = new Array[Int](w)
    val zBnd = new Array[Double](w + 1)
    var i = 0
    while (i < h) {
      var k = 0
      vIdx(0) = 0
      zBnd(0) = -INF
      zBnd(1) = INF
      var q = 1
      while (q < w) {
        val fq = g(i * w + q)
        var s = 0.0
        var done = false
        while (!done) {
          val vk = vIdx(k)
          s = ((fq + q.toDouble * q) - (g(i * w + vk) + vk.toDouble * vk)) / (2.0 * q - 2.0 * vk)
          if (s <= zBnd(k)) k -= 1 else done = true
        }
        k += 1
        vIdx(k) = q
        zBnd(k) = s
        zBnd(k + 1) = INF
        q += 1
      }
      k = 0
      q = 0
      while (q < w) {
        while (zBnd(k + 1) < q) k += 1
        val vk = vIdx(k)
        val d = q.toDouble - vk
        out(i * w + q) = d * d + g(i * w + vk)
        q += 1
      }
      i += 1
    }
    out
  }
}
