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

import jax
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
    # () int32, extrema dropped by the capacity clamp (0 = none). None when
    # the producer had no total available (refine_candidates alone).
    overflow: jnp.ndarray = None


def extrema_mask(
    dog: jnp.ndarray, thresh: float, edge_limit: float | None = None
) -> jnp.ndarray:
    """(5, H, W) bool mask of strict 3x3x3 extrema exceeding ``thresh``.

    Plane s of the result corresponds to DoG plane s+1 compared against
    planes s and s+2 (cudaSiftD.cu:1308,1328-1357). Implemented as static
    slices of a single zero-padded copy (border pixels are masked off anyway,
    so pad values are irrelevant) — one fused VPU stencil after XLA.

    ``edge_limit``: when set, the reference's edge-response rejection
    (tra^2 < edgeLimit*det, cudaSiftD.cu:1390) is applied HERE, densely, with
    arithmetic identical to ``refine_candidates``. The reference runs the
    test per candidate inside refinement; evaluating the same expression at
    the same integer pixel densely keeps the surviving set identical while
    halving the candidates that reach compaction and the per-keypoint
    stages (roughly half of raw DoG extrema fail the edge test on real
    images), and uses overflow capacity for real keypoints only.
    """
    _, h, w = dog.shape
    p = jnp.pad(dog, ((0, 0), (1, 1), (0, 0)))

    # Per-plane 3-row column max/min, then full 3x3 per-plane extremes.
    up, mid, dn = p[:, 0:h], dog, p[:, 2 : 2 + h]
    cmax = jnp.maximum(jnp.maximum(up, mid), dn)
    cmin = jnp.minimum(jnp.minimum(up, mid), dn)
    pc = jnp.pad(cmax, ((0, 0), (0, 0), (1, 1)), constant_values=-jnp.inf)
    qc = jnp.pad(cmin, ((0, 0), (0, 0), (1, 1)), constant_values=jnp.inf)
    left_max, right_max = pc[:, :, 0:w], pc[:, :, 2 : 2 + w]
    left_min, right_min = qc[:, :, 0:w], qc[:, :, 2 : 2 + w]
    m3max = jnp.maximum(jnp.maximum(left_max, cmax), right_max)
    m3min = jnp.minimum(jnp.minimum(left_min, cmin), right_min)

    center = dog[1:6]
    # 8-neighbor extremes in the center plane (exclude the center pixel):
    # side columns use the 3-row extreme, the center column only y+-1.
    vert2max = jnp.maximum(up[1:6], dn[1:6])
    vert2min = jnp.minimum(up[1:6], dn[1:6])
    p8max = jnp.maximum(jnp.maximum(left_max[1:6], right_max[1:6]), vert2max)
    p8min = jnp.minimum(jnp.minimum(left_min[1:6], right_min[1:6]), vert2min)
    nbrmax = jnp.maximum(jnp.maximum(m3max[0:5], m3max[2:7]), p8max)
    nbrmin = jnp.minimum(jnp.minimum(m3min[0:5], m3min[2:7]), p8min)

    mask = (center > jnp.maximum(thresh, nbrmax)) | (
        center < jnp.minimum(-thresh, nbrmin)
    )
    if edge_limit is not None:
        # Same ops and order as refine_candidates so the filtered set is
        # bit-identical to post-refinement edge rejection.
        pc2 = jnp.pad(center, ((0, 0), (0, 0), (1, 1)), mode="edge")
        pr2 = jnp.pad(center, ((0, 0), (1, 1), (0, 0)), mode="edge")
        pd = jnp.pad(center, ((0, 0), (1, 1), (1, 1)), mode="edge")
        dxx = 2.0 * center - pc2[:, :, 0:w] - pc2[:, :, 2 : 2 + w]
        dyy = 2.0 * center - pr2[:, 0:h] - pr2[:, 2 : 2 + h]
        dxy = 0.25 * (
            pd[:, 2 : 2 + h, 2 : 2 + w]
            + pd[:, 0:h, 0:w]
            - pd[:, 0:h, 2 : 2 + w]
            - pd[:, 2 : 2 + h, 0:w]
        )
        tra = dxx + dyy
        det = dxx * dyy - dxy * dxy
        mask = mask & (tra * tra < edge_limit * det)
    yy = jnp.arange(h)
    xx = jnp.arange(w)
    interior = ((yy > 0) & (yy < h - 1))[:, None] & ((xx > 0) & (xx < w - 1))[None, :]
    return mask & interior


def compact_mask(mask: jnp.ndarray, capacity: int, with_total: bool = False,
                 radix: int = 256):
    """Compact a boolean mask into raster-ordered flat indices.

    Returns (flat_indices (capacity,) int32, count () int32) — plus the
    pre-clamp extrema total () int32 when ``with_total`` (free: the rank
    pyramid computes it anyway), so callers can report capacity overflow
    explicitly instead of inferring it from ``count == capacity``. Entries
    past ``count`` are zero. Overflowing candidates are dropped (the
    reference clamps into the last slot instead, cudaSiftD.cu:1421 —
    dropping is the cleaner fixed-capacity semantic).

    Implemented as a hierarchical radix rank search: per-chunk popcounts
    build a small pyramid; each selected slot descends it with one row-gather
    + radix-lane cumsum per level. Everything is dense VPU work plus two
    small gathers per slot — no flat scatter (serializes on TPU), no
    full-length cumsum, no O(capacity * N) comparisons. Level 0 stays int8
    (the full-mask-sized pyramid level is bandwidth). Radix 256 measured
    fastest in context (round-5 interleaved minima over the five 1080p
    octaves: 512 -> 2.007 ms, 256 -> 1.919, 128 -> 2.367, dog included;
    all radii bit-identical — benchmarks/compact_radix_ab.py).

    The per-level lane cumsum runs on the MXU as a triangular matmul where
    that is provably exact: level-0 entries are 0/1 and level-1 entries are
    chunk popcounts <= radix <= 256 — all integers <= 256 are exact in the
    bf16 operand cast, and the MXU accumulates in f32 (exact below 2^24).
    Deeper levels (masks > radix^3 elements, e.g. 4K images at radix 256)
    keep the integer ``jnp.cumsum``. The ``start`` rank rebase reads the
    masked cumsum maximum instead of re-summing the gathered rows.
    """
    flat = mask.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % radix
    if pad:
        flat = jnp.pad(flat, (0, pad))

    # Pyramid: levels[0] = (n/512, 512) int8 mask chunks; higher levels hold
    # the previous level's chunk sums, re-chunked by 512. Convert BEFORE the
    # reshape: the full-mask relayout is the expensive step (41 us at the
    # 1080p o0), and converting first keeps it to ONE s8 pass instead of XLA
    # materializing separate s8 and s32 copies of the chunked mask.
    levels = []
    cur = flat.astype(jnp.int8).reshape(-1, radix)
    levels.append(cur)
    sums = cur.sum(axis=1, dtype=jnp.int32)
    while sums.shape[0] > radix:
        spad = (-sums.shape[0]) % radix
        if spad:
            sums = jnp.pad(sums, (0, spad))
        cur = sums.reshape(-1, radix)
        levels.append(cur)
        sums = cur.sum(axis=1)
    top = sums  # (<=512,)
    top_cum = jnp.cumsum(top)
    total = top_cum[-1]
    count = jnp.minimum(total, capacity).astype(jnp.int32)

    targets = jnp.arange(1, capacity + 1, dtype=jnp.int32)  # rank k, 1-based
    # Top level: index of first entry with cumsum >= k, and the prefix total.
    below = top_cum[None, :] < targets[:, None]              # (cap, <=512)
    node = below.sum(axis=1).astype(jnp.int32)
    start = jnp.sum(jnp.where(below, top[None, :], 0), axis=1)

    from .scan import _tri_np

    # Descend: at each level gather the selected rows, rank within them.
    for depth, lvl in enumerate(reversed(levels)):
        rows = lvl[node]                                     # (cap, radix)
        # Entry bound at this level: radix^(level index). levels is ordered
        # bottom-up, so the descent visits the deepest level LAST.
        bound = radix ** (len(levels) - 1 - depth)
        rank = (targets - start)[:, None]                    # 1-based in-node
        if bound <= 256:
            tri = jnp.asarray(_tri_np()[:radix, :radix], jnp.bfloat16)
            cum = jax.lax.dot_general(
                rows.astype(jnp.bfloat16), tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # exact integers
            below = cum < rank.astype(jnp.float32)
            start = start + jnp.max(
                jnp.where(below, cum, 0.0), axis=1).astype(jnp.int32)
        else:
            rows = rows.astype(jnp.int32)
            cum = jnp.cumsum(rows, axis=1)
            below = cum < rank
            start = start + jnp.max(jnp.where(below, cum, 0), axis=1)
        loc = below.sum(axis=1).astype(jnp.int32)
        node = node * radix + loc

    idx = jnp.where(targets <= total, node, 0)
    if with_total:
        return idx, count, total.astype(jnp.int32)
    return idx, count


def refine_candidates(
    dog: jnp.ndarray,
    flat_idx: jnp.ndarray,
    count: jnp.ndarray,
    edge_limit: float,
    lowest_scale: float,
    factor: float = 1.0 / NUM_SCALES,
) -> Candidates:
    """Vectorized subpixel refinement of compacted candidates.

    Replicates cudaSiftD.cu:1379-1428 exactly (including its negated
    second-derivative convention). The detection threshold is applied only at
    the extrema-mask stage, as in the reference — refinement never re-tests
    it, which keeps this signature identical to the Pallas twin
    ``refine_candidates_pallas``. ``lowest_scale`` is already divided by the
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

    # Gather the 3x3x3 cube from a channels-last packing where each pixel's
    # row also carries its x-neighbors: 3 row-gathers of 96 B per candidate
    # (one per y offset) instead of 9 — TPU gathers are latency-bound per
    # index, so fewer, fatter indices win. The 3x widened dense pack is one
    # fused pad+concat pass. Scale selection happens densely via channel
    # masks.
    packed = jnp.pad(jnp.moveaxis(dog, 0, -1), ((0, 0), (0, 0), (0, 1)))
    pw_ = jnp.pad(packed, ((0, 0), (1, 1), (0, 0)))
    trip = jnp.concatenate(
        [pw_[:, 0:w], pw_[:, 1 : 1 + w], pw_[:, 2 : 2 + w]], axis=-1
    ).reshape(h * w, 24)
    offs = jnp.asarray([-w, 0, w], jnp.int32)
    rows9 = trip[(y * w + x)[:, None] + offs[None, :]]       # (K, 3, 24)
    rows9 = rows9.reshape(k, 9, 8)                           # (K, 9, 8)
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2)
    cube = [
        jnp.sum(
            jnp.where(ch == (s + j)[:, None, None], rows9, 0.0), axis=2
        )
        for j in range(3)
    ]  # 3 x (K, 9): scale planes s, s+1, s+2

    def at(ds, dy, dx):
        return cube[ds + 1][:, (dy + 1) * 3 + (dx + 1)]

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
    use_pallas: bool = False,
) -> Candidates:
    """Full detection for one octave: mask -> compact -> refine.

    ``use_pallas``: refine via the count-gated Pallas DMA kernel
    (ops/pallas/refine.py) instead of XLA gathers — same arithmetic, ~10x
    faster on TPU. The XLA path remains the CPU/golden twin.
    """
    mask = extrema_mask(dog, thresh, edge_limit)
    flat_idx, count, total = compact_mask(mask, capacity, with_total=True)
    overflow = total - count
    if use_pallas:
        from .pallas.refine import refine_candidates_pallas

        xp, yp, sc, sh, ed, valid = refine_candidates_pallas(
            dog, flat_idx, count, edge_limit, lowest_scale
        )
        return Candidates(
            xpos=xp, ypos=yp, scale=sc, sharpness=sh, edgeness=ed,
            valid=valid, count=count, overflow=overflow,
        )
    cands = refine_candidates(dog, flat_idx, count, edge_limit, lowest_scale)
    return cands._replace(overflow=overflow)
