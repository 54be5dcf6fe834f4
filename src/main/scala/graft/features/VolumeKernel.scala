package graft.features

/** Moberg & Sosik biovolume / surface-area estimators — the reference's
  * scientific core (`ifcb-features/ifcb_features/biovolume.py`):
  *
  *  - `distmap`: the distance-map algorithm (biovolume.py:56-98) — the
  *    euclidean distance transform of the blob interior relative to its
  *    perimeter drives a correction-factored revolution integral, with
  *    the deterministic column-major float32 accumulation the reference
  *    uses for MATLAB parity.
  *  - `sor`: the solid-of-revolution algorithm (biovolume.py:100-158) —
  *    per-column half-width circles swept through 721 angles, quad areas
  *    via the cross-product (bottom_top_area, biovolume.py:7-45), cone
  *    frustum volumes.
  *
  * The shape rule choosing between them lives in [[Features]]
  * (all.py:225-233).
  */
object VolumeKernel {

  /** (volume, representative transect/width, surface area) */
  final case class VolSA(volume: Double, rep: Double, surfaceArea: Double)

  private val Pi32 = math.Pi.toFloat
  private val Sqrt2_32 = math.sqrt(2.0).toFloat

  /** Distance-map biovolume over a tight blob mask (biovolume.py:56-98).
    * All scalar reductions run in float32 in MATLAB column-major order —
    * bit-compatible with the reference's deterministic loops.
    */
  def distmap(blob: Mask): VolSA = {
    val perim = Raster.perimeter(blob)
    // distances measured to the perimeter pixels, +1
    val d2 = Raster.edt2(perim)
    val fill = Raster.fillHoles(perim)
    val h = blob.h; val w = blob.w
    // D: float64 distances, NaN outside the filled perimeter
    val dMap = new Array[Double](h * w)
    var k = 0
    while (k < h * w) {
      dMap(k) = if (fill.data(k)) math.sqrt(d2(k)) + 1.0 else Double.NaN
      k += 1
    }
    // column-major float32 sum / count
    var sumAcc = 0.0f
    var cnt = 0
    var j = 0
    while (j < w) {
      var i = 0
      while (i < h) {
        val v = dMap(i * w + j)
        if (!v.isNaN) { sumAcc = sumAcc + v.toFloat; cnt += 1 }
        i += 1
      }
      j += 1
    }
    val meanVal = if (cnt > 0) sumAcc / cnt.toFloat else Float.NaN
    val x = 4.0f * meanVal - 2.0f
    val c1 = (x * x) / (x * x + 2.0f * x + 0.5f)
    val c2 = (math.Pi / 2.0).toFloat
    val volume = c1 * c2 * 2.0f * sumAcc
    // surface area over the zero-filled float32 distance map
    val z = new Array[Float](h * w)
    k = 0
    while (k < h * w) {
      z(k) = if (dMap(k).isNaN) 0.0f else dMap(k).toFloat
      k += 1
    }
    val (areaBot, areaTop) = bottomTopArea32(h, w, z)
    val c = (Pi32 * x / 2.0f) / (2.0f * Sqrt2_32 * x / 2.0f + (1.0f + Sqrt2_32) / 2.0f)
    // deterministic column-major float32 sums of the quad areas
    var sumBot = 0.0f; var sumTop = 0.0f
    j = 0
    while (j < w - 1) {
      var i = 0
      while (i < h - 1) {
        sumBot = sumBot + areaBot(i * (w - 1) + j)
        sumTop = sumTop + areaTop(i * (w - 1) + j)
        i += 1
      }
      j += 1
    }
    val sa = 2.0f * c * (sumBot + sumTop)
    VolSA(volume.toDouble, x.toDouble, sa.toDouble)
  }

  /** bottom/top quad areas for the distmap surface (biovolume.py:7-45 with
    * ignore_ground=True), float32 throughout: X = col+1, Y = row+1, Z
    * given. Quads are zeroed where the local Z neighborhood is flat zero.
    */
  private def bottomTopArea32(h: Int, w: Int, z: Array[Float]): (Array[Float], Array[Float]) = {
    val oh = h - 1; val ow = w - 1
    val bot = new Array[Float](oh * ow)
    val top = new Array[Float](oh * ow)
    var i = 0
    while (i < oh) {
      var j = 0
      while (j < ow) {
        // corners: A=(i,j) B=(i+1,j) D=(i+1,j+1) C=(i,j+1); X=col+1, Y=row+1
        val zA = z(i * w + j); val zB = z((i + 1) * w + j)
        val zC = z(i * w + j + 1); val zD = z((i + 1) * w + j + 1)
        // AB = A - B: (dx, dy, dz)
        val ab1 = 0.0f; val ab2 = -1.0f; val ab3 = zA - zB
        // AD = A - D
        val ad1 = -1.0f; val ad2 = -1.0f; val ad3 = zA - zD
        // CD = C - D
        val cd1 = 0.0f; val cd2 = -1.0f; val cd3 = zC - zD
        var l1 = (ab2 * ad3) - (ab3 * ad2); l1 = l1 * l1
        var l2 = (ab3 * ad1) - (ab1 * ad3); l2 = l2 * l2
        var l3 = (ab1 * ad2) - (ab2 * ad1); l3 = l3 * l3
        var m1 = (cd2 * ad3) - (cd3 * ad2); m1 = m1 * m1
        var m2 = (cd3 * ad1) - (cd1 * ad3); m2 = m2 * m2
        var m3 = (cd1 * ad2) - (cd2 * ad1); m3 = m3 * m3
        val ind = math.abs(ab3) + math.abs(ad3) + math.abs(cd3) + zA
        if (ind == 0.0f) {
          bot(i * ow + j) = 0.0f
          top(i * ow + j) = 0.0f
        } else {
          bot(i * ow + j) = 0.5f * math.sqrt((l1 + l2 + l3).toDouble).toFloat
          top(i * ow + j) = 0.5f * math.sqrt((m1 + m2 + m3).toDouble).toFloat
        }
        j += 1
      }
      i += 1
    }
    (bot, top)
  }

  /** Solid-of-revolution biovolume over the ROTATED blob (biovolume.py:
    * 100-158), float64: per-column radii swept through 0..180 deg in
    * 0.25-deg steps, frustum volume, revolved quad surface plus end caps.
    */
  def sor(rotated: Mask): VolSA = {
    val h = rotated.h; val w = rotated.w
    // column sums and first-set row per column
    val colSum = new Array[Double](w)
    val firstRow = new Array[Double](w)
    var j = 0
    while (j < w) {
      var s = 0.0; var first = -1
      var i = 0
      while (i < h) {
        if (rotated(i, j)) { s += 1; if (first < 0) first = i }
        i += 1
      }
      colSum(j) = s
      firstRow(j) = if (first < 0) 0.0 else first + 1.0 // argmax+1 (0 if empty)
      j += 1
    }
    val cols = (0 until w).filter(colSum(_) > 0).toArray
    val nSlices = cols.length
    if (nSlices == 0) return VolSA(0.0, 0.0, 0.0)
    val r = cols.map(colSum(_) / 2.0)
    val center0 = Array.tabulate(nSlices)(s => firstRow(cols(s)) + r(s))
    val center = center0.clone()
    if (nSlices >= 2) {
      center(0) = center0(1)
      center(nSlices - 1) = center0(nSlices - 2)
    }
    val da = 0.25
    val nAngles = (180.0 / da).toInt + 1 // 0..180 inclusive
    // x: slice index 1..n with half-pixel edge adjustment
    val x = Array.tabulate(nSlices)(_ + 1.0)
    x(0) -= 0.5
    x(nSlices - 1) += 0.5
    // surface: quads over the (slice, angle) grid
    var saSum = 0.0
    // precompute cos/sin per angle
    val cosA = new Array[Double](nAngles)
    val sinA = new Array[Double](nAngles)
    var a = 0
    while (a < nAngles) {
      val ang = a * da * (math.Pi / 180.0)
      cosA(a) = math.cos(ang)
      sinA(a) = math.sin(ang)
      a += 1
    }
    var s = 0
    while (s < nSlices - 1) {
      a = 0
      while (a < nAngles - 1) {
        // corners in (X, Y, Z): A=(s,a) B=(s+1,a) D=(s+1,a+1) C=(s,a+1)
        val xA = x(s); val xB = x(s + 1)
        val yA = center(s) + cosA(a) * r(s)
        val yB = center(s + 1) + cosA(a) * r(s + 1)
        val yC = center(s) + cosA(a + 1) * r(s)
        val yD = center(s + 1) + cosA(a + 1) * r(s + 1)
        val zA = sinA(a) * r(s)
        val zB = sinA(a) * r(s + 1)
        val zC = sinA(a + 1) * r(s)
        val zD = sinA(a + 1) * r(s + 1)
        val ab1 = xA - xB; val ab2 = yA - yB; val ab3 = zA - zB
        val ad1 = xA - xB; val ad2 = yA - yD; val ad3 = zA - zD
        val cd1 = xA - xB; val cd2 = yC - yD; val cd3 = zC - zD
        val l1 = (ab2 * ad3) - (ab3 * ad2)
        val l2 = (ab3 * ad1) - (ab1 * ad3)
        val l3 = (ab1 * ad2) - (ab2 * ad1)
        val m1 = (cd2 * ad3) - (cd3 * ad2)
        val m2 = (cd3 * ad1) - (cd1 * ad3)
        val m3 = (cd1 * ad2) - (cd2 * ad1)
        saSum += 0.5 * math.sqrt(l1 * l1 + l2 * l2 + l3 * l3)
        saSum += 0.5 * math.sqrt(m1 * m1 + m2 * m2 + m3 * m3)
        a += 1
      }
      s += 1
    }
    var sa = 2.0 * saSum
    // flat end caps
    sa += math.Pi * r(0) * r(0) + math.Pi * r(nSlices - 1) * r(nSlices - 1)
    // frustum volumes
    var v = 0.0
    s = 0
    while (s < nSlices - 1) {
      val b1 = math.Pi * r(s + 1) * r(s + 1)
      val b2 = math.Pi * r(s) * r(s)
      val hh = x(s + 1) - x(s)
      v += (hh / 3.0) * (b1 + b2 + math.sqrt(b1 * b2))
      s += 1
    }
    val xr = r.map(_ * 2.0).sum / nSlices
    VolSA(v, xr, sa)
  }
}
