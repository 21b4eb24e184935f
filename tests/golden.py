"""Pure-numpy golden model of the SIFT pipeline.

This is a direct, readable restatement of the *semantics* of the reference
kernels (cited per function), used as ground truth for the JAX/Pallas
implementation. It is intentionally slow and scalar-free of any JAX idioms.
"""

from __future__ import annotations

import math

import numpy as np

NUM_SCALES = 5
LAPLACE_R = 4


def gaussian_kernel(radius: int, variance: float) -> np.ndarray:
    j = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(j * j) / (2.0 * variance))
    return (k / k.sum()).astype(np.float64)


def clamp(v, lo, hi):
    return max(lo, min(v, hi))


def sep_conv_clamp(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable convolution with clamp-to-edge, vertical then horizontal.

    Semantics of LowPass (cudaSiftD.cu:1928-1950) and the per-scale blur in
    LaplaceMultiMem (cudaSiftD.cu:1753-1793): 1-D taps applied along y with
    row clamping, then along x with column clamping.
    """
    r = (len(k) - 1) // 2
    h, w = img.shape
    padded = np.pad(img, r, mode="edge").astype(np.float64)
    tmp = np.zeros((h, w + 2 * r))
    for y in range(h):
        for j in range(-r, r + 1):
            tmp[y] += k[j + r] * padded[y + r + j, :]
    out = np.zeros((h, w))
    for x in range(w):
        for j in range(-r, r + 1):
            out[:, x] += k[j + r] * tmp[:, x + r + j]
    return out


def low_pass(img: np.ndarray, sigma: float) -> np.ndarray:
    """9-tap Gaussian prefilter (cudaSiftH.cu:406-435, cudaSiftD.cu:1986)."""
    k = gaussian_kernel(LAPLACE_R, sigma * sigma)
    return sep_conv_clamp(img, k)


def scale_down(img: np.ndarray, variance: float = 0.5) -> np.ndarray:
    """5-tap Gaussian blur + 2x decimation (cudaSiftD.cu:84-168).

    out[y, x] = sum_ij k[i] k[j] img[clamp(2y+j-2), clamp(2x+i-2)].
    """
    k = gaussian_kernel(2, variance)
    blurred = sep_conv_clamp(img, k)
    h, w = img.shape
    return blurred[: (h // 2) * 2 : 2, : (w // 2) * 2 : 2]


def scale_up(img: np.ndarray) -> np.ndarray:
    """2x bilinear upsample, top-left aligned (cudaSiftD.cu:170-190)."""
    h, w = img.shape
    out = np.zeros((2 * h, 2 * w))
    for y in range(h):
        for x in range(w):
            xr = min(x + 1, w - 1)
            yd = min(y + 1, h - 1)
            out[2 * y, 2 * x] = img[y, x]
            out[2 * y, 2 * x + 1] = 0.5 * (img[y, x] + img[y, xr])
            out[2 * y + 1, 2 * x] = 0.5 * (img[y, x] + img[yd, x])
            out[2 * y + 1, 2 * x + 1] = 0.25 * (
                img[y, x] + img[y, xr] + img[yd, x] + img[yd, xr]
            )
    return out


def laplace_kernel_table(num_octaves: int) -> np.ndarray:
    """(num_octaves, 8, 9) Gaussian taps; octave 0 = full working resolution.

    Mirrors PrepareLaplaceKernels (cudaSiftH.cu:439-458): the top octave uses
    residual blur 0, lower octaves accumulate b' = sqrt(b^2 + 0.25)/2.
    Normalization counts off-center taps twice (cudaSiftH.cu:452).
    """
    out = np.zeros((num_octaves, 8, 9))
    blur = 0.0
    for o in range(num_octaves):
        scale = 2.0 ** (-1.0 / NUM_SCALES)
        for s in range(8):
            var = scale * scale - blur * blur
            j = np.arange(0, LAPLACE_R + 1, dtype=np.float64)
            half = np.exp(-(j * j) / (2.0 * var))
            half /= half[0] + 2.0 * half[1:].sum()
            out[o, s, LAPLACE_R:] = half
            out[o, s, :LAPLACE_R] = half[1:][::-1]
            scale *= 2.0 ** (1.0 / NUM_SCALES)
        blur = math.sqrt(blur * blur + 0.25) / 2.0
    return out


def dog_octave(base: np.ndarray, kernels: np.ndarray) -> np.ndarray:
    """8 Gaussian blurs -> 7 DoG planes (LaplaceMultiMem cudaSiftD.cu:1753).

    dog[s] = blur[s+1] - blur[s] (cudaSiftD.cu:1789).
    """
    blurs = [sep_conv_clamp(base, kernels[s]) for s in range(8)]
    return np.stack([blurs[s + 1] - blurs[s] for s in range(7)])


def find_extrema(dog: np.ndarray, thresh: float) -> list[tuple[int, int, int]]:
    """3x3x3 strict extrema over the 5 middle DoG planes.

    Mirrors FindPointsMultiNew (cudaSiftD.cu:1292-1359): scale index s in
    [0, 5) compares plane s+1 against planes s and s+2; the candidate must
    exceed thresh in magnitude and be strictly larger (smaller) than all 26
    neighbors. Border pixels never qualify because the reference's clamped
    loads compare the center against itself. Returned in (s, y, x) raster
    order.
    """
    _, h, w = dog.shape
    pts = []
    for s in range(NUM_SCALES):
        c = dog[s + 1]
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                v = c[y, x]
                if abs(v) <= thresh:
                    continue
                cube = dog[s : s + 3, y - 1 : y + 2, x - 1 : x + 2].copy()
                # Exclude the center from the neighbor extreme.
                cube[1, 1, 1] = -np.inf if v > 0 else np.inf
                if v > 0 and v > cube.max():
                    pts.append((s, y, x))
                elif v < 0 and v < cube.min():
                    pts.append((s, y, x))
    return pts


def refine_point(dog: np.ndarray, s: int, y: int, x: int,
                 edge_limit: float = 10.0):
    """Subpixel refinement (cudaSiftD.cu:1379-1428).

    Returns None if rejected by the edge test, else a dict with xpos, ypos,
    scale factor exponent pieces, sharpness and edgeness. Note the reference's
    sign conventions: second derivatives are negated relative to the usual
    finite-difference stencil and ds is lower-minus-upper; we replicate them
    exactly.
    """
    c = dog[s + 1]
    d0 = dog[s]
    d2 = dog[s + 2]
    val = c[y, x]
    dxx = 2.0 * val - c[y, x - 1] - c[y, x + 1]
    dyy = 2.0 * val - c[y - 1, x] - c[y + 1, x]
    dxy = 0.25 * (c[y + 1, x + 1] + c[y - 1, x - 1] - c[y - 1, x + 1] - c[y + 1, x - 1])
    tra = dxx + dyy
    det = dxx * dyy - dxy * dxy
    if tra * tra >= edge_limit * det:
        return None
    edge = tra * tra / det
    dx = 0.5 * (c[y, x + 1] - c[y, x - 1])
    dy = 0.5 * (c[y + 1, x] - c[y - 1, x])
    ds = 0.5 * (d0[y, x] - d2[y, x])
    dss = 2.0 * val - d2[y, x] - d0[y, x]
    dxs = 0.25 * (d2[y, x + 1] + d0[y, x - 1] - d0[y, x + 1] - d2[y, x - 1])
    dys = 0.25 * (d2[y + 1, x] + d0[y - 1, x] - d2[y - 1, x] - d0[y + 1, x])
    idxx = dyy * dss - dys * dys
    idxy = dys * dxs - dxy * dss
    idxs = dxy * dys - dyy * dxs
    idet = 1.0 / (idxx * dxx + idxy * dxy + idxs * dxs)
    idyy = dxx * dss - dxs * dxs
    idys = dxy * dxs - dxx * dys
    idss = dxx * dyy - dxy * dxy
    pdx = idet * (idxx * dx + idxy * dy + idxs * ds)
    pdy = idet * (idxy * dx + idyy * dy + idys * ds)
    pds = idet * (idxs * dx + idys * dy + idss * ds)
    if abs(pdx) > 0.5 or abs(pdy) > 0.5 or abs(pds) > 0.5:
        pdx = dx / dxx
        pdy = dy / dyy
        pds = ds / dss
    dval = 0.5 * (dx * pdx + dy * pdy + ds * pds)
    sc = 2.0 ** (s / NUM_SCALES) * 2.0 ** (pds / NUM_SCALES)
    return dict(
        xpos=x + pdx, ypos=y + pdy, scale=sc,
        sharpness=val + dval, edgeness=edge,
    )


def tex2d(img: np.ndarray, x: float, y: float) -> float:
    """CUDA tex2D linear filtering with clamp addressing, unnormalized coords.

    The hardware samples at (x-0.5, y-0.5) in pixel-center coordinates with
    texel clamping (cudaSiftH.cu:198-200 sets clamp+linear). We use exact
    float interpolation rather than the HW's 8-bit fraction.
    """
    h, w = img.shape
    xb = min(max(x - 0.5, 0.0), w - 1.0)
    yb = min(max(y - 0.5, 0.0), h - 1.0)
    x0 = int(math.floor(xb))
    y0 = int(math.floor(yb))
    ax = xb - x0
    ay = yb - y0
    x1 = min(x0 + 1, w - 1)
    y1 = min(y0 + 1, h - 1)
    return (
        (1 - ax) * (1 - ay) * img[y0, x0]
        + ax * (1 - ay) * img[y0, x1]
        + (1 - ax) * ay * img[y1, x0]
        + ax * ay * img[y1, x1]
    )


def compute_orientations(img: np.ndarray, xpos: float, ypos: float,
                         scale: float) -> list[float]:
    """Orientation(s) of one keypoint (ComputeOrientationsCONST,
    cudaSiftD.cu:972-1057).

    32-bin histogram of bilinear gradients over an 11x11 window, Gaussian
    weighted with sigma = 1.5*scale, smoothed with [1,4,6,4,1] (circular),
    local peaks kept, top peak (and second peak >= 0.8*max) refined with a
    parabola. Returns 1 or 2 orientations in degrees; the first is the
    primary.
    """
    i2sigma2 = -1.0 / (2.0 * 1.5 * 1.5 * scale * scale)
    gauss = [math.exp(i2sigma2 * (i - 5) * (i - 5)) for i in range(11)]
    hist = np.zeros(32)
    xp = xpos - 4.5
    yp = ypos - 4.5
    for yd in range(11):
        for xd in range(11):
            xf = xp + xd
            yf = yp + yd
            dx = tex2d(img, xf + 1.0, yf) - tex2d(img, xf - 1.0, yf)
            dy = tex2d(img, xf, yf + 1.0) - tex2d(img, xf, yf - 1.0)
            bin_ = int(16.0 * math.atan2(dy, dx) / 3.1416 + 16.5)
            if bin_ > 31:
                bin_ = 0
            grad = math.sqrt(dx * dx + dy * dy)
            hist[bin_] += grad * gauss[xd] * gauss[yd]
    sm = np.zeros(32)
    for t in range(32):
        sm[t] = (
            6.0 * hist[t]
            + 4.0 * (hist[(t - 1) % 32] + hist[(t + 1) % 32])
            + hist[(t - 2) % 32]
            + hist[(t + 2) % 32]
        )
    peaks = np.where(
        (sm > np.roll(sm, 1)) & (sm >= np.roll(sm, -1)), sm, 0.0
    )
    # First-maximum scan semantics (cudaSiftD.cu:1017-1033).
    i1, i2 = -1, -1
    max1, max2 = 0.0, 0.0
    for i in range(32):
        v = peaks[i]
        if v > max1:
            max2, i2 = max1, i1
            max1, i1 = v, i
        elif v > max2:
            max2, i2 = v, i

    def interp(i, m):
        v1 = sm[(i + 1) % 32]
        v2 = sm[(i - 1) % 32]
        peak = i + 0.5 * (v1 - v2) / (2.0 * m - v1 - v2)
        return 11.25 * (peak + 32.0 if peak < 0.0 else peak)

    out = [interp(i1, max1)]
    if max2 > 0.8 * max1:
        out.append(interp(i2, max2))
    return out


def fast_atan2(y: float, x: float) -> float:
    """Polynomial atan2 approximation (FastAtan2, cudaSiftD.cu:295-306)."""
    absx, absy = abs(x), abs(y)
    mx, mn = max(absx, absy), min(absx, absy)
    a = 0.0 if mx == 0.0 else mn / mx
    s = a * a
    r = ((-0.0464964749 * s + 0.15931422) * s - 0.327622764) * s * a + a
    if absy > absx:
        r = 1.57079637 - r
    if x < 0:
        r = 3.14159274 - r
    if y < 0:
        r = -r
    return r


def extract_descriptor(img: np.ndarray, xpos: float, ypos: float,
                       scale: float, orientation: float) -> np.ndarray:
    """128-D descriptor of one oriented keypoint
    (ExtractSiftDescriptorsCONSTNew, cudaSiftD.cu:308-417).

    16x16 rotated sample grid with spacing 0.75*scale, bilinear gradient taps
    with the deliberate +0.5 shift (cudaSiftD.cu:338), Gaussian weighting
    exp(-(i-7.5)^2/128), trilinear soft binning into 4x4x8, then
    L2 -> clamp 0.2 -> L2 normalization.
    """
    theta = 2.0 * 3.1415 / 360.0 * orientation
    sina, cosa = math.sin(theta), math.cos(theta)
    sc = 12.0 / 16.0 * scale
    ssina, scosa = sc * sina, sc * cosa
    gauss = [math.exp(-(i - 7.5) ** 2 / 128.0) for i in range(16)]
    buf = np.zeros(128)
    for y in range(16):
        for tx in range(16):
            xs = xpos + (tx - 7.5) * scosa - (y - 7.5) * ssina + 0.5
            ys = ypos + (tx - 7.5) * ssina + (y - 7.5) * scosa + 0.5
            dx = tex2d(img, xs + cosa, ys + sina) - tex2d(img, xs - cosa, ys - sina)
            dy = tex2d(img, xs - sina, ys + cosa) - tex2d(img, xs + sina, ys - cosa)
            grad = gauss[y] * gauss[tx] * math.sqrt(dx * dx + dy * dy)
            angf = 4.0 / 3.1415 * fast_atan2(dy, dx) + 4.0
            hori = (tx + 2) // 4 - 1
            horf = (tx - 1.5) / 4.0 - hori
            ihorf = 1.0 - horf
            veri = (y + 2) // 4 - 1
            verf = (y - 1.5) / 4.0 - veri
            iverf = 1.0 - verf
            angi = int(angf) % 8  # reference leaves 8 unwrapped; see notes
            angp = (angi + 1) % 8
            angfr = angf - int(angf)
            iangf = 1.0 - angfr
            hist = 8 * (4 * veri + hori)
            p1 = angi + hist
            p2 = angp + hist
            if tx >= 2:
                g1 = ihorf * grad
                if y >= 2:
                    buf[p1] += iangf * iverf * g1
                    buf[p2] += angfr * iverf * g1
                if y <= 13:
                    buf[p1 + 32] += iangf * verf * g1
                    buf[p2 + 32] += angfr * verf * g1
            if tx <= 13:
                g1 = horf * grad
                if y >= 2:
                    buf[p1 + 8] += iangf * iverf * g1
                    buf[p2 + 8] += angfr * iverf * g1
                if y <= 13:
                    buf[p1 + 40] += iangf * verf * g1
                    buf[p2 + 40] += angfr * verf * g1
    t1 = np.minimum(buf / max(np.linalg.norm(buf), 1e-30), 0.2)
    return t1 / max(np.linalg.norm(t1), 1e-30)


def match_brute_force(d1: np.ndarray, d2: np.ndarray):
    """Best/second-best cosine scores (FindMaxCorr10, matching.cu:301-397).

    Returns (score, ambiguity, match_index) per row of d1. Second-best
    excludes the best index itself; ambiguity = sec / (best + 1e-6).
    """
    scores = d1 @ d2.T
    best_idx = scores.argmax(axis=1)
    best = scores[np.arange(len(d1)), best_idx]
    masked = scores.copy()
    masked[np.arange(len(d1)), best_idx] = -np.inf
    second = masked.max(axis=1)
    ambiguity = second / (best + 1e-6)
    return best, ambiguity, best_idx


def homography_dlt(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """8x8 DLT from 4 correspondences (ComputeHomographies,
    matching.cu:907-948). Returns the 8 homography parameters (h22 = 1)."""
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x1, y1 = src[i]
        x2, y2 = dst[i]
        a[2 * i + 0] = [x1, y1, 1, 0, 0, 0, -x2 * x1, -x2 * y1]
        a[2 * i + 1] = [0, 0, 0, x1, y1, 1, -y2 * x1, -y2 * y1]
        b[2 * i + 0] = x2
        b[2 * i + 1] = y2
    return np.linalg.solve(a, b)


def count_inliers(h8: np.ndarray, src: np.ndarray, dst: np.ndarray,
                  thresh: float) -> int:
    """Division-free inlier test (TestHomographies, matching.cu:969-981)."""
    x1, y1 = src[:, 0], src[:, 1]
    x2, y2 = dst[:, 0], dst[:, 1]
    nomx = h8[0] * x1 + h8[1] * y1 + h8[2]
    nomy = h8[3] * x1 + h8[4] * y1 + h8[5]
    deno = h8[6] * x1 + h8[7] * y1 + 1.0
    err2 = (x2 * deno - nomx) ** 2 + (y2 * deno - nomy) ** 2
    return int((err2 < thresh * thresh * deno * deno).sum())
