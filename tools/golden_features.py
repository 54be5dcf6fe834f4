#!/usr/bin/env python3
"""Golden-value generator for the graft feature-extraction kernel.

Runs the REFERENCE implementation (/root/reference/code/python/ifcb-features,
the Moberg-Sosik biovolume + blob-geometry kernel) over small synthetic
fixtures and writes the expected feature values to
src/test/resources/features_golden.json, which FeatureKernelSpec checks the
Scala port against.

The container has numpy but not scipy/skimage/phasepack, so this script
installs numpy-only shims for the handful of primitives the reference
imports. Each shim implements the exact documented algorithm (exact
euclidean distance transform, 4/8-connected labeling, monotone-chain convex
hull, skimage border semantics for binary morphology), so the reference's
own float32/float64 arithmetic produces the golden numbers — the shims only
replace library plumbing, never the science.

Phase congruency (phasepack) is NOT shimmed faithfully: segmentation
goldens use a Sobel-magnitude edge stand-in, injected identically here and
in the Scala port (graft.features.Segmentation.sobelEdges). Parity for the
rest of the segmentation chain (hysteresis threshold, border trim, closing,
thinning, k-means background split, fill, erosion, blob-min) is exact.

Builder-side tooling only; not part of the library.
"""
import json
import math
import os
import sys
import types

import numpy as np

REF = "/root/reference/code/python/ifcb-features"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "features_golden.json")


# ---------------------------------------------------------------- shims

def _pad_correlate(img, w, flip, cval=0.0):
    """ndimage.correlate/convolve with mode='constant'."""
    img = np.asarray(img, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    if flip:
        w = w[::-1, ::-1]
    kh, kw = w.shape
    ch, cw = kh // 2, kw // 2
    padded = np.pad(img, ((ch, kh - 1 - ch), (cw, kw - 1 - cw)),
                    constant_values=cval)
    out = np.zeros_like(img)
    for di in range(kh):
        for dj in range(kw):
            if w[di, dj] != 0:
                out += w[di, dj] * padded[di:di + img.shape[0],
                                          dj:dj + img.shape[1]]
    return out


def sh_correlate(img, weights, mode="constant", cval=0.0):
    assert mode == "constant"
    out = _pad_correlate(img, weights, flip=False, cval=cval)
    if np.issubdtype(np.asarray(img).dtype, np.integer) and \
            np.issubdtype(np.asarray(weights).dtype, np.integer):
        return np.rint(out).astype(np.int64)
    return out


def sh_convolve(img, weights, mode="constant", cval=0.0):
    assert mode == "constant"
    return _pad_correlate(img, weights, flip=True, cval=cval)


def sh_label(img, structure=None):
    """Connected-component labeling, raster-scan numbering."""
    img = np.asarray(img) != 0
    if structure is None:
        nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    else:
        s = np.asarray(structure) != 0
        nbrs = [(di - 1, dj - 1) for di in range(3) for dj in range(3)
                if s[di, dj] and not (di == 1 and dj == 1)]
    h, w = img.shape
    lab = np.zeros((h, w), dtype=np.int32)
    nxt = 0
    for i in range(h):
        for j in range(w):
            if img[i, j] and lab[i, j] == 0:
                nxt += 1
                stack = [(i, j)]
                lab[i, j] = nxt
                while stack:
                    y, x = stack.pop()
                    for dy, dx in nbrs:
                        ny, nx_ = y + dy, x + dx
                        if 0 <= ny < h and 0 <= nx_ < w and \
                                img[ny, nx_] and lab[ny, nx_] == 0:
                            lab[ny, nx_] = nxt
                            stack.append((ny, nx_))
    return lab, nxt


def sh_find_objects(lab):
    n = int(lab.max())
    out = []
    for k in range(1, n + 1):
        ys, xs = np.where(lab == k)
        if ys.size == 0:
            out.append(None)
        else:
            out.append((slice(int(ys.min()), int(ys.max()) + 1),
                        slice(int(xs.min()), int(xs.max()) + 1)))
    return out


def sh_distance_transform_edt(img):
    """Exact EDT: distance from each nonzero pixel to nearest zero."""
    img = np.asarray(img) != 0
    h, w = img.shape
    zy, zx = np.where(~img)
    if zy.size == 0:
        return np.full((h, w), np.inf)
    yy, xx = np.indices((h, w))
    pts = np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.int64)
    zs = np.stack([zy, zx], axis=1).astype(np.int64)
    d2 = ((pts[:, None, :] - zs[None, :, :]) ** 2).sum(axis=2).min(axis=1)
    return np.sqrt(d2.astype(np.float64)).reshape(h, w)


def sh_zoom(img, z, order=1, mode="nearest"):
    """scipy.ndimage.zoom subset: order-1 (bilinear), grid_mode=False
    endpoint-aligned mapping (out endpoint = in endpoint), 2D only.
    Mirrored exactly by graft.features.RingWedge.bilinearZoom.
    """
    assert order == 1
    img = np.asarray(img, dtype=np.float64)
    ih, iw = img.shape
    oh = int(round(ih * z[0]))
    ow = int(round(iw * z[1]))
    out = np.zeros((oh, ow))
    ry = (ih - 1) / (oh - 1) if oh > 1 else 0.0
    rx = (iw - 1) / (ow - 1) if ow > 1 else 0.0
    for i in range(oh):
        y = i * ry
        y0 = int(np.floor(y))
        y1 = min(y0 + 1, ih - 1)
        fy = y - y0
        for j in range(ow):
            x = j * rx
            x0 = int(np.floor(x))
            x1 = min(x0 + 1, iw - 1)
            fx = x - x0
            out[i, j] = (img[y0, x0] * (1 - fy) * (1 - fx) +
                         img[y0, x1] * (1 - fy) * fx +
                         img[y1, x0] * fy * (1 - fx) +
                         img[y1, x1] * fy * fx)
    return out


def sh_binary_fill_holes(img, structure=None):
    """Flood background 4-connected from border; unreached bg = holes."""
    img = np.asarray(img) != 0
    h, w = img.shape
    reach = np.zeros((h, w), dtype=bool)
    stack = [(i, j) for i in range(h) for j in (0, w - 1) if not img[i, j]]
    stack += [(i, j) for i in (0, h - 1) for j in range(w) if not img[i, j]]
    for i, j in stack:
        reach[i, j] = True
    while stack:
        y, x = stack.pop()
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ny, nx_ = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx_ < w and \
                    not img[ny, nx_] and not reach[ny, nx_]:
                reach[ny, nx_] = True
                stack.append((ny, nx_))
    return img | ~reach


class QhullError(Exception):
    pass


class _Hull:
    """Monotone-chain 2D convex hull; .vertices in CCW order (scipy)."""

    def __init__(self, points):
        pts = np.asarray(points, dtype=np.float64)
        order = np.lexsort((pts[:, 1], pts[:, 0]))
        uniq = []
        for i in order:
            if not uniq or tuple(pts[i]) != tuple(pts[uniq[-1]]):
                uniq.append(i)
        if len(uniq) < 3:
            raise QhullError("fewer than 3 unique points")

        def cross(o, a, b):
            return ((pts[a][0] - pts[o][0]) * (pts[b][1] - pts[o][1]) -
                    (pts[a][1] - pts[o][1]) * (pts[b][0] - pts[o][0]))

        lower, upper = [], []
        for i in uniq:
            while len(lower) >= 2 and cross(lower[-2], lower[-1], i) <= 0:
                lower.pop()
            lower.append(i)
        for i in reversed(uniq):
            while len(upper) >= 2 and cross(upper[-2], upper[-1], i) <= 0:
                upper.pop()
            upper.append(i)
        verts = lower[:-1] + upper[:-1]
        if len(verts) < 3:
            raise QhullError("collinear input")
        self.vertices = np.array(verts, dtype=np.int64)


def sh_pdist(pts):
    pts = np.asarray(pts, dtype=np.float64)
    n = pts.shape[0]
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            out.append(math.sqrt(((pts[i] - pts[j]) ** 2).sum()))
    return np.array(out)


class _KDTree:
    """Brute-force stand-in for cKDTree: exact nearest distances."""

    def __init__(self, pts):
        self.pts = np.asarray(pts, dtype=np.float64)

    def query(self, q, k=1):
        q = np.asarray(q, dtype=np.float64)
        d = np.sqrt(((q[:, None, :] - self.pts[None, :, :]) ** 2).sum(axis=2))
        return d.min(axis=1), d.argmin(axis=1)


def sh_skew(a):
    a = np.asarray(a, dtype=np.float64)
    m = a.mean()
    m2 = ((a - m) ** 2).mean()
    m3 = ((a - m) ** 3).mean()
    return m3 / m2 ** 1.5


def sh_kurtosis(a, fisher=True):
    a = np.asarray(a, dtype=np.float64)
    m = a.mean()
    m2 = ((a - m) ** 2).mean()
    m4 = ((a - m) ** 4).mean()
    g = m4 / m2 ** 2
    return g - 3.0 if fisher else g


def sh_moment(a, k):
    a = np.asarray(a, dtype=np.float64)
    return ((a - a.mean()) ** k).mean()


def sh_rescale_intensity(img, in_range):
    lo, hi = in_range
    img = np.asarray(img, dtype=np.float64)
    out = (np.clip(img, lo, hi) - lo) / (hi - lo)
    return out


def sh_histogram(image, nbins=256):
    """skimage.exposure.histogram for float input: np.histogram over the
    data range."""
    image = np.asarray(image, dtype=np.float64)
    hist, edges = np.histogram(image, bins=nbins,
                               range=(image.min(), image.max()))
    centers = (edges[:-1] + edges[1:]) / 2
    return hist, centers


def _binary_dilate(img, selem):
    """skimage semantics: out-of-bounds = False for dilation."""
    img = np.asarray(img) != 0
    selem = np.asarray(selem) != 0
    kh, kw = selem.shape
    ch, cw = kh // 2, kw // 2
    padded = np.pad(img, ((ch, kh - 1 - ch), (cw, kw - 1 - cw)),
                    constant_values=False)
    out = np.zeros_like(img)
    for di in range(kh):
        for dj in range(kw):
            if selem[di, dj]:
                out |= padded[di:di + img.shape[0], dj:dj + img.shape[1]]
    return out


def _binary_erode(img, selem):
    """skimage semantics: out-of-bounds = True for erosion."""
    img = np.asarray(img) != 0
    selem = np.asarray(selem) != 0
    kh, kw = selem.shape
    ch, cw = kh // 2, kw // 2
    padded = np.pad(img, ((ch, kh - 1 - ch), (cw, kw - 1 - cw)),
                    constant_values=True)
    out = np.ones_like(img)
    for di in range(kh):
        for dj in range(kw):
            if selem[di, dj]:
                out &= padded[di:di + img.shape[0], dj:dj + img.shape[1]]
    return out


def sh_diamond(r):
    n = 2 * r + 1
    yy, xx = np.indices((n, n))
    return (np.abs(yy - r) + np.abs(xx - r) <= r)


def sh_disk(r):
    n = 2 * r + 1
    yy, xx = np.indices((n, n))
    return ((yy - r) ** 2 + (xx - r) ** 2 <= r * r)


class _Region:
    def __init__(self, lab, k):
        ys, xs = np.where(lab == k)
        self.area = int(ys.size)
        self.bbox = (int(ys.min()), int(xs.min()),
                     int(ys.max()) + 1, int(xs.max()) + 1)
        self.image = (lab[self.bbox[0]:self.bbox[2],
                          self.bbox[1]:self.bbox[3]] == k)
        self.equivalent_diameter = math.sqrt(4.0 * self.area / math.pi)
        bh = self.bbox[2] - self.bbox[0]
        bw = self.bbox[3] - self.bbox[1]
        self.extent = self.area / float(bh * bw)
        self.centroid = (float(ys.mean()), float(xs.mean()))


def sh_sk_label(img, connectivity=2):
    structure = np.ones((3, 3)) if connectivity == 2 else None
    lab, _ = sh_label(img, structure)
    return lab


def sh_regionprops(lab):
    n = int(lab.max())
    return [_Region(lab, k) for k in range(1, n + 1)]


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_shims():
    # the reference targets an older numpy with the removed scalar aliases
    for alias, typ in [("bool", bool), ("int", int), ("float", float),
                       ("object", object)]:
        if not hasattr(np, alias):
            setattr(np, alias, typ)

    def _unused(*a, **k):
        raise NotImplementedError("shim: not needed for slim features")

    scipy = _mod("scipy")
    ndimage = _mod("scipy.ndimage",
                   correlate=sh_correlate, convolve=sh_convolve,
                   label=sh_label, find_objects=sh_find_objects,
                   distance_transform_edt=sh_distance_transform_edt,
                   binary_fill_holes=sh_binary_fill_holes,
                   zoom=sh_zoom)
    _mod("scipy.ndimage.morphology", binary_fill_holes=sh_binary_fill_holes)
    meas = _mod("scipy.ndimage.measurements",
                label=sh_label, find_objects=sh_find_objects)
    ndimage.measurements = meas
    ndimage.morphology = sys.modules["scipy.ndimage.morphology"]
    scipy.ndimage = ndimage

    spatial = _mod("scipy.spatial", ConvexHull=_Hull, QhullError=QhullError,
                   cKDTree=_KDTree)
    _mod("scipy.spatial.distance", pdist=sh_pdist, cdist=_unused)
    spatial.distance = sys.modules["scipy.spatial.distance"]
    scipy.spatial = spatial

    stats = _mod("scipy.stats", skew=sh_skew, kurtosis=sh_kurtosis,
                 moment=sh_moment)
    scipy.stats = stats

    skimage = _mod("skimage", img_as_float=lambda x: np.asarray(
        x, dtype=np.float64) / 255.0)
    _mod("skimage.morphology",
         binary_dilation=_binary_dilate, binary_erosion=_binary_erode,
         binary_closing=lambda img, selem: _binary_erode(
             _binary_dilate(img, selem), selem),
         diamond=sh_diamond, disk=sh_disk, reconstruction=_unused)
    _mod("skimage.measure", label=sh_sk_label, regionprops=sh_regionprops)
    _mod("skimage.draw", polygon=_unused, line=_unused)
    _mod("skimage.filters")
    _mod("skimage.exposure", rescale_intensity=sh_rescale_intensity,
         histogram=sh_histogram)
    _mod("skimage.feature")
    for sub in ["morphology", "measure", "draw", "filters", "exposure",
                "feature"]:
        setattr(skimage, sub, sys.modules[f"skimage.{sub}"])
    _mod("phasepack", phasecong=_unused)


# ------------------------------------------- phase congruency (numpy mirror)

def phasecong_Mm_numpy(roi):
    """Kovesi's published phase-congruency algorithm (phasecong3 /
    phasepack covariance path) with the IFCB parameters — an independent
    numpy transcription used to golden-test the Scala port
    (graft.features.PhaseCongruency). NOT phasepack itself (unavailable
    offline); both sides implement the same public description.
    Returns M + m.
    """
    nscale, norient = 4, 6
    min_wl, mult, sigma_onf = 2.0, 2.5, 0.55
    k_sd, cut_off, g = 2.0, 0.3, 5.0
    eps = 1e-4
    img = np.asarray(roi, dtype=np.float64)
    h, w = img.shape
    IM = np.fft.fft2(img)

    if w % 2 == 1:
        xr = (np.arange(w) - (w - 1) // 2) / float(w - 1)
    else:
        xr = (np.arange(w) - w // 2) / float(w)
    if h % 2 == 1:
        yr = (np.arange(h) - (h - 1) // 2) / float(h - 1)
    else:
        yr = (np.arange(h) - h // 2) / float(h)
    x, y = np.meshgrid(xr, yr)
    radius = np.fft.ifftshift(np.sqrt(x ** 2 + y ** 2))
    theta = np.fft.ifftshift(np.arctan2(-y, x))
    radius[0, 0] = 1.0
    sintheta, costheta = np.sin(theta), np.cos(theta)
    lp = 1.0 / (1.0 + (radius / 0.45) ** 30)
    log_gabor = []
    for s in range(nscale):
        fo = 1.0 / (min_wl * mult ** s)
        gab = np.exp(-(np.log(radius / fo)) ** 2 /
                     (2 * np.log(sigma_onf) ** 2)) * lp
        gab[0, 0] = 0.0
        log_gabor.append(gab)

    covx2 = np.zeros((h, w)); covy2 = np.zeros((h, w)); covxy = np.zeros((h, w))
    for o in range(norient):
        angl = o * np.pi / norient
        ds = sintheta * np.cos(angl) - costheta * np.sin(angl)
        dc = costheta * np.cos(angl) + sintheta * np.sin(angl)
        dtheta = np.minimum(np.abs(np.arctan2(ds, dc)) * norient / 2.0, np.pi)
        spread = (np.cos(dtheta) + 1.0) / 2.0
        sumE = np.zeros((h, w)); sumO = np.zeros((h, w))
        sumAn = np.zeros((h, w)); maxAn = np.zeros((h, w))
        EO = []
        tau = 0.0
        for s in range(nscale):
            eo = np.fft.ifft2(IM * log_gabor[s] * spread)
            EO.append(eo)
            an = np.abs(eo)
            sumAn += an
            sumE += np.real(eo)
            sumO += np.imag(eo)
            if s == 0:
                tau = np.median(an) / np.sqrt(np.log(4.0))
                maxAn = an.copy()
            else:
                maxAn = np.maximum(maxAn, an)
        xe = np.sqrt(sumE ** 2 + sumO ** 2) + eps
        meanE, meanO = sumE / xe, sumO / xe
        energy = np.zeros((h, w))
        for s in range(nscale):
            e, oo = np.real(EO[s]), np.imag(EO[s])
            energy += e * meanE + oo * meanO - np.abs(e * meanO - oo * meanE)
        total_tau = tau * (1.0 - (1.0 / mult) ** nscale) / (1.0 - 1.0 / mult)
        noise_mean = total_tau * np.sqrt(np.pi / 2.0)
        noise_sigma = total_tau * np.sqrt((4.0 - np.pi) / 2.0)
        energy = np.maximum(energy - (noise_mean + k_sd * noise_sigma), 0.0)
        width = (sumAn / (maxAn + eps) - 1.0) / (nscale - 1)
        weight = 1.0 / (1.0 + np.exp(g * (cut_off - width)))
        pc = weight * energy / sumAn
        covx = pc * np.cos(angl); covy = pc * np.sin(angl)
        covx2 += covx ** 2; covy2 += covy ** 2; covxy += covx * covy

    covx2 /= norient / 2.0
    covy2 /= norient / 2.0
    covxy *= 4.0 / norient
    denom = np.sqrt(covxy ** 2 + (covx2 - covy2) ** 2) + eps
    M = (covy2 + covx2 + denom) / 2.0
    m = (covy2 + covx2 - denom) / 2.0
    return M + m


# ------------------------------------------------- edge-detector stand-in

def sobel_edges(roi):
    """Deterministic stand-in for phasecong_Mm: normalized Sobel gradient
    magnitude on roi/255, float64. Mirrored exactly by
    graft.features.Segmentation.sobelEdges.
    """
    r = np.asarray(roi, dtype=np.float64) / 255.0
    gx = sh_correlate(r, np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]))
    gy = sh_correlate(r, np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]]))
    g = np.sqrt(gx * gx + gy * gy)
    m = g.max()
    return g / m if m > 0 else g


# ------------------------------------------------------------- fixtures

def fixtures():
    """Deterministic synthetic (roi, blob-mask) pairs. The prng is a
    hand-rolled LCG so the fixture is reproducible from this file alone.
    """
    out = {}

    def lcg(seed):
        state = [seed]

        def nxt():
            state[0] = (state[0] * 1103515245 + 12345) % (1 << 31)
            return state[0]
        return nxt

    # 1. solid ellipse (round blob: SOR path of the shape rule)
    h, w = 25, 35
    yy, xx = np.indices((h, w))
    ellipse = (((yy - 12) / 8.0) ** 2 + ((xx - 17) / 13.0) ** 2) <= 1.0
    out["ellipse"] = ellipse

    # 2. crescent (concave: distmap path — convex_area/area > 1.2)
    crescent = ellipse & ~((((yy - 10) / 7.0) ** 2 +
                            ((xx - 20) / 11.0) ** 2) <= 1.0)
    out["crescent"] = crescent

    # 3. thin diagonal rod (eccentric, distmap path)
    rod = np.zeros((30, 30), dtype=bool)
    for i in range(26):
        rod[2 + i, 2 + i] = True
        if 2 + i + 1 < 30:
            rod[2 + i + 1, 2 + i] = True
            rod[2 + i, 2 + i + 1] = True
    out["rod"] = rod

    # 4. two blobs (numBlobs / summed features)
    ty, tx = np.indices((28, 40))
    two = ((ty - 13) ** 2 + (tx - 10) ** 2) <= 49
    two[4:22, 24:32] = True
    out["two_blobs"] = two

    # 5. blob with a hole (fill_holes in the distmap path)
    ring = (((yy - 12) ** 2 + (xx - 17) ** 2) <= 100) & \
           (((yy - 12) ** 2 + (xx - 17) ** 2) >= 16)
    out["ring"] = ring

    # 6. degenerate blob: a 1-px-tall bar — collinear perimeter points
    # exercise the QhullError/raw-points fallbacks (hull props fall back
    # to (perimeter, area); Feret diameters compute from the raw points)
    bar = np.zeros((8, 50), dtype=bool)
    bar[3, 2:48] = True
    out["bar"] = bar

    # 7. random speckle + core (blob-min filtering, multiple components).
    # Segmentation-only: the reference kernel assumes segmented masks
    # (blob-min >= 41 px) and crashes on 1-px blobs, so this fixture only
    # exercises the segmentation chain.
    rnd = lcg(42)
    spk = np.zeros((32, 32), dtype=bool)
    spk[8:20, 8:22] = True
    for _ in range(40):
        i, j = rnd() % 32, rnd() % 32
        spk[i, j] = True
    out["speckle@seg_only"] = spk

    return out


def roi_for(mask, seed):
    """Synthetic grayscale uint8 roi: bright background, dark blob,
    deterministic noise.
    """
    h, w = mask.shape
    state = seed

    def nxt():
        nonlocal state
        state = (state * 1103515245 + 12345) % (1 << 31)
        return state
    img = np.zeros((h, w), dtype=np.uint8)
    for i in range(h):
        for j in range(w):
            base = 80 if mask[i, j] else 200
            img[i, j] = base + nxt() % 21  # +0..20 noise
    return img


# --------------------------------------------------------------- main

def extended_features(RoiFeatures, roi, mask):
    """Non-slim feature tail (perimeter stats, symmetry, rotated box,
    invariant moments, texture, HOG) via the reference accessors.
    """
    r = RoiFeatures(roi, blobs_image=mask)
    b = r.blobs[0]
    # parity precondition: subsample_dist sorts by a possibly-colliding
    # key with a non-stable sort — fixtures must keep keys unique
    pts = np.vstack(b.perimeter_points).T
    keys = (pts * [pts[:, 1].max(), 1]).sum(axis=1)
    assert len(set(keys.tolist())) == len(keys), "perimeter sort-key collision"
    out = {
        "perimeter_mean": b.perimeter_mean,
        "perimeter_median": b.perimeter_median,
        "perimeter_skewness": b.perimeter_skewness,
        "perimeter_kurtosis": b.perimeter_kurtosis,
        "h180": b.h180, "h90": b.h90, "hflip": b.hflip,
        "b180": b.b180, "b90": b.b90, "bflip": b.bflip,
        "rotated_area": float(b.rotated_area),
        "rotated_bbox_xwidth": float(b.rotated_bbox_xwidth),
        "rotated_bbox_ywidth": float(b.rotated_bbox_ywidth),
        "rotated_bbox_solidity": b.rotated_bbox_solidity,
    }
    for i, v in enumerate(r.invmoments):
        out[f"moment_invariant{i + 1}"] = float(v)
    tx = r.texture_stats
    for k, v in zip(["texture_average_gray_level", "texture_average_contrast",
                     "texture_smoothness", "texture_third_moment",
                     "texture_uniformity", "texture_entropy"], tx):
        out[k] = float(v)
    for i, v in enumerate(r.hog):
        out[f"hog{i + 1:02d}"] = float(v)
    pwr_integral, pwr_ratio, wedges, rings = r.ring_wedge
    out["rw_power_integral"] = float(pwr_integral)
    out["rw_power_ratio"] = float(pwr_ratio)
    for i, v in enumerate(rings):
        out[f"ring{i + 1:02d}"] = float(v)
    for i, v in enumerate(wedges):
        out[f"wedge{i + 1:02d}"] = float(v)
    return {k: (None if isinstance(v, float) and math.isnan(v) else float(v))
            for k, v in out.items()}


# Fixed per-ROI metadata for the end-to-end EcoTaxa row golden. The Scala
# side (EcoTaxaExportSpec) mirrors this record verbatim; any drift fails
# the column-by-column comparison.
ECOTAXA_META = {
    "image": "D20230801T120000_IFCB134_00042.png",
    "roi": 42,
    "lat": 57.5,
    "lon": 11.8,
    "date": "20230801",
    "time": "12:00:00",
    "class_clean": "Mesodinium rubrum",
    "subfolder": "Mesodinium rubrum",
    "aphia_id": 232069,
    "analysis_date": "20230910",
    "analysis_time": "09:30:00",
    "annotated_by": "Alice Allen",
    "annotated_by_email": "alice@example.org",
    "ship": "R/V Svea",
    "sample_name": "D20230801T120000_IFCB134",
    "station_name": "BY31",
    "cruise_number": "77",
}


def ecotaxa_row(feats, ext):
    """Complete expected EcoTaxa row for one ROI: the Rmd:483-783
    assignment sequence transcribed INDEPENDENTLY of the Scala mapping
    (the cross-check is the point), populated from the reference kernel's
    slim features `feats` (dict) + extended tail `ext` (dict) + the fixed
    metadata above + the Scala-side default EcoTaxaExport.Params. Columns
    the Rmd fills from MATLAB-kernel-only fields (summedFeretDiameter,
    shapehist_mode_normEqD, PMT channels) are None, matching the export's
    null-for-unprovided contract.
    """
    m = ECOTAXA_META
    row = {
        "img_file_name": m["image"],
        # static Params defaults (jobs/EcoTaxaExport.Params)
        "object_link": "https://example.org/dataset-doi",
        "object_annotation_status": "validated",
        "acq_resolution_pixels_per_micron": 3.4,
        "acq_instrument": "IFCB",
        "sample_source": "",
        "process_soft": "Spark, Scala",
        "process_soft_version": "",
        "process_library": "graft",
        "process_library_version": "2",
        "process_script": "EcoTaxaExport",
        "process_script_version": "1",
        "process_date": "",
        "process_time": "",
        "object_id": m["image"].rsplit(".", 1)[0],
        "object_roi_number": m["roi"],
        "object_lat": m["lat"],
        "object_lon": m["lon"],
        "object_date": m["date"],
        "object_time": m["time"].replace(":", ""),
        "object_annotation_hierarchy": m["class_clean"],
        "object_annotation_category": m["subfolder"],
        "object_aphiaid": m["aphia_id"],
        "object_annotation_date": m["analysis_date"],
        "object_annotation_time": m["analysis_time"].replace(":", ""),
        "object_annotation_person_name": m["annotated_by"],
        "object_annotation_person_email": m["annotated_by_email"],
        "object_depth_min": 0.0,
        "object_depth_max": 0.0,
        "sample_vessel": m["ship"],
        "sample_id": m["sample_name"],
        "sample_station": m["station_name"],
        "sample_cruise": m["cruise_number"],
        # MATLAB-kernel-only / unknown fields
        "object_pmt_scattering": None,
        "object_pmt_fluorescence": None,
        "object_summed_feret_diameter": None,
        "object_shapehist_mode_norm_eq_d": None,
        # morphology from the slim kernel (Rmd names -> kernel names;
        # FeretDiameter == the kernel's maxFeretDiameter)
        "object_area": feats["Area"],
        "object_biovolume": feats["Biovolume"],
        "object_perimeter": feats["Perimeter"],
        "object_bounding_box_xwidth": feats["BoundingBox_xwidth"],
        "object_bounding_box_ywidth": feats["BoundingBox_ywidth"],
        "object_convex_area": feats["ConvexArea"],
        "object_convex_perimeter": feats["ConvexPerimeter"],
        "object_feret_diameter": feats["maxFeretDiameter"],
        "object_major_axis_length": feats["MajorAxisLength"],
        "object_minor_axis_length": feats["MinorAxisLength"],
        "object_orientation": feats["Orientation"],
        "object_eccentricity": feats["Eccentricity"],
        "object_equiv_diameter": feats["EquivDiameter"],
        "object_extent": feats["Extent"],
        "object_solidity": feats["Solidity"],
        "object_num_blobs": feats["numBlobs"],
        "object_summed_area": feats["summedArea"],
        "object_summed_biovolume": feats["summedBiovolume"],
        "object_summed_convex_area": feats["summedConvexArea"],
        "object_summed_convex_perimeter": feats["summedConvexPerimeter"],
        "object_summed_major_axis_length": feats["summedMajorAxisLength"],
        "object_summed_minor_axis_length": feats["summedMinorAxisLength"],
        "object_summed_perimeter": feats["summedPerimeter"],
        "object_area_over_perimeter_squared": feats["Area_over_PerimeterSquared"],
        "object_area_over_perimeter": feats["Area_over_Perimeter"],
        "object_summed_convex_perimeter_over_perimeter":
            feats["summedConvexPerimeter_over_Perimeter"],
        # extended tail (RWcenter2total/RWhalfpower == ring-wedge ratio/
        # integral; H* == Hausdorff symmetry; rotated_* and texture_*
        # direct; the *_over_* ratios are the MATLAB kernel's ratio
        # columns recomputed from their parts)
        "object_r_wcenter2total_powerratio": ext["rw_power_ratio"],
        "object_r_whalfpowerintegral": ext["rw_power_integral"],
        "object_h180": ext["h180"],
        "object_h90": ext["h90"],
        "object_hflip": ext["hflip"],
        "object_h90_over_hflip": ext["h90"] / ext["hflip"],
        "object_h90_over_h180": ext["h90"] / ext["h180"],
        "object_hflip_over_h180": ext["hflip"] / ext["h180"],
        "object_shapehist_kurtosis_norm_eq_d": ext["perimeter_kurtosis"],
        "object_shapehist_mean_norm_eq_d": ext["perimeter_mean"],
        "object_shapehist_median_norm_eq_d": ext["perimeter_median"],
        "object_shapehist_skewness_norm_eq_d": ext["perimeter_skewness"],
        "object_rotated_bounding_box_solidity": ext["rotated_bbox_solidity"],
        "object_rotated_area": ext["rotated_area"],
        "object_rotated_bounding_box_xwidth": ext["rotated_bbox_xwidth"],
        "object_rotated_bounding_box_ywidth": ext["rotated_bbox_ywidth"],
        "object_texture_average_contrast": ext["texture_average_contrast"],
        "object_texture_average_gray_level": ext["texture_average_gray_level"],
        "object_texture_entropy": ext["texture_entropy"],
        "object_texture_smoothness": ext["texture_smoothness"],
        "object_texture_third_moment": ext["texture_third_moment"],
        "object_texture_uniformity": ext["texture_uniformity"],
    }
    for i in range(1, 8):
        row[f"object_moment_invariant{i}"] = ext[f"moment_invariant{i}"]
    for i in range(1, 51):
        row[f"object_ring{i:02d}"] = ext[f"ring{i:02d}"]
    for i in range(1, 82):
        row[f"object_hog{i:02d}"] = ext[f"hog{i:02d}"]
    for i in range(1, 49):
        row[f"object_wedge{i:02d}"] = ext[f"wedge{i:02d}"]
    return {k: (None if isinstance(v, float) and math.isnan(v) else v)
            for k, v in row.items()}


def main():
    install_shims()
    sys.path.insert(0, REF)
    from ifcb_features.all import compute_features, RoiFeatures  # noqa: E402
    import ifcb_features.segmentation as seg  # noqa: E402
    seg.phasecong_Mm = sobel_edges  # inject the documented stand-in

    golden = {"features": {}, "segmentation": {}, "features_ext": {},
              "segmentation_pc": {}, "phasecong": {}}
    for name, mask in fixtures().items():
        seg_only = name.endswith("@seg_only")
        name = name.removesuffix("@seg_only")
        roi = roi_for(mask, seed=7)
        if not seg_only:
            _, feats = compute_features(roi, blobs_image=mask)
            golden["features"][name] = {
                "mask": ["".join("1" if v else "0" for v in row)
                         for row in mask],
                "roi": [[int(v) for v in row] for row in roi],
                "expected": {k: (None if isinstance(v, float) and
                                 math.isnan(v) else float(v))
                             for k, v in feats},
            }
            golden["features_ext"][name] = {
                "expected": extended_features(RoiFeatures, roi, mask),
            }
        # end-to-end segmentation golden (Sobel stand-in edges)
        seg.phasecong_Mm = sobel_edges
        seg_mask = seg.segment_roi(roi)
        golden["segmentation"][name] = {
            "roi": [[int(v) for v in row] for row in roi],
            "mask": ["".join("1" if v else "0" for v in row)
                     for row in seg_mask],
        }
        # and with the phase-congruency numpy mirror (the default chain)
        seg.phasecong_Mm = phasecong_Mm_numpy
        seg_mask_pc = seg.segment_roi(roi)
        golden["segmentation_pc"][name] = {
            "mask": ["".join("1" if v else "0" for v in row)
                     for row in seg_mask_pc],
        }
        # raw M+m map for direct transcription parity
        mm = phasecong_Mm_numpy(roi)
        golden["phasecong"][name] = {
            "mm": [[float(v) for v in row] for row in mm],
        }

    # end-to-end EcoTaxa row golden for one fixture: slim + extended
    # reference-kernel values pushed through the Rmd's assignment map
    golden["ecotaxa_row"] = {
        "fixture": "ellipse",
        "metadata": ECOTAXA_META,
        "expected": ecotaxa_row(
            golden["features"]["ellipse"]["expected"],
            golden["features_ext"]["ellipse"]["expected"]),
    }

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1, sort_keys=True)
    n = len(golden["features"])
    print(f"wrote {OUT}: {n} feature fixtures, {n} segmentation fixtures")


if __name__ == "__main__":
    main()
