"""DoG extrema detection, subpixel refinement and compaction.

TPU-native replacement for ``FindPointsMultiNew`` (cudaSiftD.cu:1292-1431).
The CUDA kernel scans 3x3x3 neighborhoods with warp shuffles and appends
candidates through ``atomicInc`` (nondeterministic order). Here:

1. a dense strict-extremum mask over the 5 middle DoG planes is built from
   separable shifted min/max reductions (pure VPU work, fully fused by XLA);
2. the mask is compacted into a fixed-capacity candidate buffer with a
   prefix-sum + scatter — deterministic (s, y, x) raster order, a property
   the reference lacks;
3. candidates gather their 3x3x3 cubes and are refined in bulk with the
   reference's exact Hessian-adjugate arithmetic and sign conventions
   (cudaSiftD.cu:1385-1417), including the per-axis Newton fallback when the
   offset leaves the +-0.5 box (cudaSiftD.cu:1410-1414).

Border pixels are excluded outright: the reference's clamped loads make the
center compare against itself at image borders, so they can never be strict
extrema (see tests/golden.py::find_extrema).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import NUM_SCALES


class Candidates(NamedTuple):
    """Fixed-capacity per-octave keypoint candidates (octave coordinates)."""

    xpos: jnp.ndarray       # (K,) f32, subpixel
    ypos: jnp.ndarray       # (K,) f32, subpixel
    scale: jnp.ndarray      # (K,) f32, octave-relative scale
    sharpness: jnp.ndarray  # (K,) f32, refined |DoG| response
    edgeness: jnp.ndarray   # (K,) f32, tra^2/det
    valid: jnp.ndarray      # (K,) bool
    count: jnp.ndarray      # () int32, number of valid entries (pre-clamp)


def _shift(a: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift a (..., H, W) array by (dy, dx) with edge replication."""
    if dy:
        pad = [(0, 0)] * (a.ndim - 2) + ([(dy, 0)] if dy > 0 else [(0, -dy)]) + [(0, 0)]
        a = jnp.pad(a, pad, mode="edge")
        a = a[..., :-dy, :] if dy > 0 else a[..., -dy:, :]
    if dx:
        pad = [(0, 0)] * (a.ndim - 1) + ([(dx, 0)] if dx > 0 else [(0, -dx)])
        a = jnp.pad(a, pad, mode="edge")
        a = a[..., :-dx] if dx > 0 else a[..., -dx:]
    return a


def extrema_mask(dog: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """(5, H, W) bool mask of strict 3x3x3 extrema exceeding ``thresh``.

    Plane s of the result corresponds to DoG plane s+1 compared against
    planes s and s+2 (cudaSiftD.cu:1308,1328-1357).
    """
    _, h, w = dog.shape
    # Per-plane 3-row column max/min (separable pass 1).
    cmax = jnp.maximum(jnp.maximum(_shift(dog, 1, 0), dog), _shift(dog, -1, 0))
    cmin = jnp.minimum(jnp.minimum(_shift(dog, 1, 0), dog), _shift(dog, -1, 0))
    # Full 3x3 per-plane max/min (separable pass 2).
    m3max = jnp.maximum(jnp.maximum(_shift(cmax, 0, 1), cmax), _shift(cmax, 0, -1))
    m3min = jnp.minimum(jnp.minimum(_shift(cmin, 0, 1), cmin), _shift(cmin, 0, -1))

    center = dog[1:6]
    # 8-neighbor max/min in the center plane (excludes the center pixel):
    # side columns use the full 3-row extreme, the center column only y+-1.
    vert2max = jnp.maximum(_shift(center, 1, 0), _shift(center, -1, 0))
    vert2min = jnp.minimum(_shift(center, 1, 0), _shift(center, -1, 0))
    p8max = jnp.maximum(
        jnp.maximum(_shift(cmax[1:6], 0, 1), _shift(cmax[1:6], 0, -1)), vert2max
    )
    p8min = jnp.minimum(
        jnp.minimum(_shift(cmin[1:6], 0, 1), _shift(cmin[1:6], 0, -1)), vert2min
    )
    nbrmax = jnp.maximum(jnp.maximum(m3max[0:5], m3max[2:7]), p8max)
    nbrmin = jnp.minimum(jnp.minimum(m3min[0:5], m3min[2:7]), p8min)

    mask = (center > jnp.maximum(thresh, nbrmax)) | (
        center < jnp.minimum(-thresh, nbrmin)
    )
    interior = jnp.zeros((h, w), bool).at[1 : h - 1, 1 : w - 1].set(True)
    return mask & interior


def compact_mask(mask: jnp.ndarray, capacity: int):
    """Compact a boolean mask into raster-ordered flat indices.

    Returns (flat_indices (capacity,) int32, count () int32). Entries past
    ``count`` are zero. Overflowing candidates are dropped (the reference
    clamps into the last slot instead, cudaSiftD.cu:1421 — dropping is the
    cleaner fixed-capacity semantic and is reported via ``count``).
    """
    flat = mask.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    count = jnp.minimum(pos[-1] + 1, capacity).astype(jnp.int32)
    dest = jnp.where(flat, pos, capacity)
    src = jnp.arange(flat.shape[0], dtype=jnp.int32)
    out = jnp.zeros((capacity,), jnp.int32).at[dest].set(src, mode="drop")
    return out, count


def refine_candidates(
    dog: jnp.ndarray,
    flat_idx: jnp.ndarray,
    count: jnp.ndarray,
    thresh: float,
    edge_limit: float,
    lowest_scale: float,
    factor: float = 1.0 / NUM_SCALES,
) -> Candidates:
    """Vectorized subpixel refinement of compacted candidates.

    Replicates cudaSiftD.cu:1379-1428 exactly (including its negated
    second-derivative convention). ``lowest_scale`` is already divided by the
    octave subsampling by the caller (cudaSiftH.cu:213).
    """
    _, h, w = dog.shape
    k = flat_idx.shape[0]
    s = flat_idx // (h * w)
    rem = flat_idx - s * (h * w)
    y = rem // w
    x = rem - y * w
    slot = jnp.arange(k, dtype=jnp.int32)
    in_range = slot < count
    # Clamp for safety on padded slots (indices are interior for real ones).
    y = jnp.clip(y, 1, h - 2)
    x = jnp.clip(x, 1, w - 2)

    def at(ds, dy, dx):
        return dog[s + 1 + ds, y + dy, x + dx]

    val = at(0, 0, 0)
    dxx = 2.0 * val - at(0, 0, -1) - at(0, 0, 1)
    dyy = 2.0 * val - at(0, -1, 0) - at(0, 1, 0)
    dxy = 0.25 * (at(0, 1, 1) + at(0, -1, -1) - at(0, -1, 1) - at(0, 1, -1))
    tra = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge_ok = tra * tra < edge_limit * det
    det_safe = jnp.where(det == 0.0, 1e-30, det)
    edge = tra * tra / det_safe

    dx_ = 0.5 * (at(0, 0, 1) - at(0, 0, -1))
    dy_ = 0.5 * (at(0, 1, 0) - at(0, -1, 0))
    ds_ = 0.5 * (at(-1, 0, 0) - at(1, 0, 0))
    dss = 2.0 * val - at(1, 0, 0) - at(-1, 0, 0)
    dxs = 0.25 * (at(1, 0, 1) + at(-1, 0, -1) - at(-1, 0, 1) - at(1, 0, -1))
    dys = 0.25 * (at(1, 1, 0) + at(-1, -1, 0) - at(1, -1, 0) - at(-1, 1, 0))

    idxx = dyy * dss - dys * dys
    idxy = dys * dxs - dxy * dss
    idxs = dxy * dys - dyy * dxs
    denom = idxx * dxx + idxy * dxy + idxs * dxs
    idet = 1.0 / jnp.where(denom == 0.0, 1e-30, denom)
    idyy = dxx * dss - dxs * dxs
    idys = dxy * dxs - dxx * dys
    idss = dxx * dyy - dxy * dxy
    pdx = idet * (idxx * dx_ + idxy * dy_ + idxs * ds_)
    pdy = idet * (idxy * dx_ + idyy * dy_ + idys * ds_)
    pds = idet * (idxs * dx_ + idys * dy_ + idss * ds_)

    out_of_box = (
        (jnp.abs(pdx) > 0.5) | (jnp.abs(pdy) > 0.5) | (jnp.abs(pds) > 0.5)
    )

    def safe_div(a, b):
        return a / jnp.where(b == 0.0, 1e-30, b)

    pdx = jnp.where(out_of_box, safe_div(dx_, dxx), pdx)
    pdy = jnp.where(out_of_box, safe_div(dy_, dyy), pdy)
    pds = jnp.where(out_of_box, safe_div(ds_, dss), pds)
    dval = 0.5 * (dx_ * pdx + dy_ * pdy + ds_ * pds)
    sc = jnp.exp2(s.astype(jnp.float32) * factor) * jnp.exp2(pds * factor)
    valid = in_range & edge_ok & (sc >= lowest_scale)

    z = jnp.float32(0.0)
    return Candidates(
        xpos=jnp.where(valid, x + pdx, z),
        ypos=jnp.where(valid, y + pdy, z),
        scale=jnp.where(valid, sc, z),
        sharpness=jnp.where(valid, val + dval, z),
        edgeness=jnp.where(valid, edge, z),
        valid=valid,
        count=count,
    )


def detect_octave(
    dog: jnp.ndarray,
    thresh: float,
    edge_limit: float,
    lowest_scale: float,
    capacity: int,
) -> Candidates:
    """Full detection for one octave: mask -> compact -> refine."""
    mask = extrema_mask(dog, thresh)
    flat_idx, count = compact_mask(mask, capacity)
    return refine_candidates(dog, flat_idx, count, thresh, edge_limit, lowest_scale)
