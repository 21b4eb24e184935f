"""Fused scale-space kernel: 8 Gaussian blurs -> 7 DoG planes -> extrema mask.

TPU-native shape of LaplaceMultiMem + the scan half of FindPointsMultiNew
(cudaSiftD.cu:1753-1793, 1292-1359). The reference reads the octave base once
per row-strip into shared memory and emits DoG planes; the extrema scan then
re-reads those planes. Here ONE kernel reads each image row-strip once (three
overlapping row blocks, auto-pipelined by Pallas), computes all 8 separable
blurs in VMEM with static-shift FMAs, differences them into 7 DoG planes, and
evaluates the strict 3x3x3 extremum test in-register — the DoG stack is
written once and the candidate mask costs no extra HBM reads.

Geometry: grid over 16-row output strips; each program sees 48 padded input
rows (halo 4 blur + 1 extremum on each side). The image is edge-padded in XLA
(top 16, left 5) so every load is in-bounds and clamp-to-edge semantics hold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.jit import tpu_jit

TH = 16        # output rows per program (8 for wide images, see wrapper)
R = 4          # Gaussian radius
NS = 8         # Gaussian scales per octave


def _dog_kernel(k_ref, a_ref, b_ref, c_ref, thr_ref, dims_ref,
                dog_ref, mask_ref, *, th, band_ref=None):
    i = pl.program_id(0)
    rows = jnp.concatenate([a_ref[:, :], b_ref[:, :], c_ref[:, :]], axis=0)
    wp = rows.shape[1]
    w_out = dog_ref.shape[2]
    thresh = thr_ref[0]
    edge_limit = thr_ref[1]
    height = dims_ref[0]
    width = dims_ref[1]

    # Vertical pass: th + 2 rows (th + 1 extremum halo each side) per
    # scale. Local input row l <-> image row th*i + l - th; dog row t needs
    # image rows (t + th*i) +- 4 -> l in [th - 5 + j, th - 5 + j + th + 2).
    if band_ref is not None:
        # MXU form: all 8 vertical 9-tap convs as ONE banded matmul
        # (8*(th+2), 3*th) @ (3*th, wp) — the column-buffer pipeline of
        # LaplaceMultiMem (cudaSiftD.cu:1762-1791) recast as a systolic
        # contraction. Offloads half the stencil FLOPs from the VPU.
        # Mosaic exposes only DEFAULT (1-pass bf16) and HIGHEST (6-pass)
        # matmuls; a manual hi/lo bf16 split of both operands with the
        # lo*lo term dropped gives 3 DEFAULT passes at ~2^-18 relative
        # error — the X3 recipe — measured parity: 0 mask flips at 1080p.
        band = band_ref[...]
        bh = band.astype(jnp.bfloat16)
        bl = (band - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        rh = rows.astype(jnp.bfloat16)
        rl = (rows - rh.astype(jnp.float32)).astype(jnp.bfloat16)

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc_all = mm(bh, rh) + mm(bh, rl) + mm(bl, rh)     # (8*(th+2), wp)
        accs = [acc_all[s * (th + 2) : (s + 1) * (th + 2)] for s in range(NS)]
    else:
        # The 9-tap Gaussians are symmetric (k[j] == k[8-j]), so the
        # vertical pass runs on symmetric PAIR SUMS of input rows — the 4
        # adds per output row are shared by all 8 scales: 4 + 8*(4 FMA +
        # 1 mul) = 44 VPU ops/px instead of 8*9 = 72. (The horizontal pass
        # gains nothing from symmetry: its inputs differ per scale, and
        # 4 adds + 5 FMAs equals 9 FMAs on the VPU.)
        pairs = [
            rows[th - 5 + j : 2 * th - 3 + j, :]
            + rows[th + 3 - j : 2 * th + 5 - j, :]
            for j in range(R)
        ]
        accs = []
        for s in range(NS):
            acc = k_ref[s, R] * rows[th - 1 : 2 * th + 1, :]
            for j in range(R):
                acc = acc + k_ref[s, j] * pairs[j]
            accs.append(acc)

    hors = []
    for s in range(NS):
        acc = accs[s]
        # Horizontal pass: img col m in [-1, w_out+1) uses padded cols
        # m+1 .. m+9 (pad_left = 5).
        hor = acc[:, 0 : w_out + 2] * k_ref[s, 0]
        for j in range(1, 2 * R + 1):
            hor = hor + k_ref[s, j] * acc[:, j : j + w_out + 2]
        hors.append(hor)

    dogs = [hors[s + 1] - hors[s] for s in range(NS - 1)]  # (th+2, w_out+2)

    for s in range(NS - 1):
        dog_ref[s, :, :] = dogs[s][1 : th + 1, 1 : w_out + 1]

    # Strict 3x3x3 extremum test on the 5 middle planes.
    row_g = (
        jax.lax.broadcasted_iota(jnp.int32, (th, w_out), 0) + i * th
    )
    col_g = jax.lax.broadcasted_iota(jnp.int32, (th, w_out), 1)
    interior = (
        (row_g >= 1) & (row_g <= height - 2) & (col_g >= 1) & (col_g <= width - 2)
    )

    # Separable shared 3x3 max/min per plane: column-triple reductions (cm)
    # feed both the full 3x3 pools (m3/n3, reused by the two scales that
    # see the plane as an outer neighbor) and the center-excluded
    # 8-neighborhood pools. max/min are associative, so the candidate mask
    # is bit-identical to the direct 26-neighbor scan at ~2.5x fewer VPU ops.
    cmx, cmn, m3x, m3n = [], [], [], []
    for p in dogs:
        cx = jnp.maximum(
            jnp.maximum(p[:, 0:w_out], p[:, 1 : w_out + 1]),
            p[:, 2 : w_out + 2],
        )                                                   # (th+2, w_out)
        cn = jnp.minimum(
            jnp.minimum(p[:, 0:w_out], p[:, 1 : w_out + 1]),
            p[:, 2 : w_out + 2],
        )
        cmx.append(cx)
        cmn.append(cn)
        m3x.append(jnp.maximum(jnp.maximum(cx[0:th], cx[1 : th + 1]),
                               cx[2 : th + 2]))             # (th, w_out)
        m3n.append(jnp.minimum(jnp.minimum(cn[0:th], cn[1 : th + 1]),
                               cn[2 : th + 2]))

    for s in range(5):
        mid = dogs[s + 1]
        c = mid[1 : th + 1, 1 : w_out + 1]
        # Center plane, center pixel excluded: top/bottom column-triples
        # plus the middle row's left/right neighbors.
        c8x = jnp.maximum(
            jnp.maximum(cmx[s + 1][0:th], cmx[s + 1][2 : th + 2]),
            jnp.maximum(mid[1 : th + 1, 0:w_out],
                        mid[1 : th + 1, 2 : w_out + 2]),
        )
        c8n = jnp.minimum(
            jnp.minimum(cmn[s + 1][0:th], cmn[s + 1][2 : th + 2]),
            jnp.minimum(mid[1 : th + 1, 0:w_out],
                        mid[1 : th + 1, 2 : w_out + 2]),
        )
        nmax = jnp.maximum(jnp.maximum(m3x[s], m3x[s + 2]), c8x)
        nmin = jnp.minimum(jnp.minimum(m3n[s], m3n[s + 2]), c8n)
        is_ext = (c > jnp.maximum(thresh, nmax)) | (
            c < jnp.minimum(-thresh, nmin)
        )
        # Dense edge-response prefilter (tra^2 < edgeLimit*det,
        # cudaSiftD.cu:1390) with arithmetic identical to
        # ops.detect.refine_candidates, so the surviving set matches
        # post-refinement edge rejection exactly (see
        # ops.detect.extrema_mask). Halo slices of the center plane give
        # the same neighbor values XLA's edge-padded slices produce on
        # interior pixels; borders are masked off anyway.
        mid = dogs[s + 1]
        dxx = (2.0 * c - mid[1 : th + 1, 0:w_out]
               - mid[1 : th + 1, 2 : w_out + 2])
        dyy = (2.0 * c - mid[0:th, 1 : w_out + 1]
               - mid[2 : th + 2, 1 : w_out + 1])
        dxy = 0.25 * (
            mid[2 : th + 2, 2 : w_out + 2]
            + mid[0:th, 0:w_out]
            - mid[0:th, 2 : w_out + 2]
            - mid[2 : th + 2, 0:w_out]
        )
        tra = dxx + dyy
        det = dxx * dyy - dxy * dxy
        is_ext = is_ext & (tra * tra < edge_limit * det)
        # bf16 mask (0/1 exact): halves the ~40 MB of mask write+read
        # traffic at 1080p vs the old f32 planes.
        mask_ref[s, :, :] = (is_ext & interior).astype(jnp.bfloat16)


def _vert_band(kernels: jnp.ndarray, th: int) -> jnp.ndarray:
    """(8*(th+2), 3*th) banded matrix for the vertical pass: row s*(th+2)+t
    dotted with the 3*th input rows equals the 9-tap vertical conv of scale s
    at local output row t (input rows th-5+t .. th+3+t)."""
    nrows = NS * (th + 2)
    s_idx = np.arange(nrows) // (th + 2)
    t_idx = np.arange(nrows) % (th + 2)
    j = np.arange(3 * th)[None, :] - t_idx[:, None] - (th - 5)
    tap_ok = (j >= 0) & (j <= 2 * R)
    taps = jnp.asarray(kernels)[s_idx[:, None], np.clip(j, 0, 2 * R)]
    return jnp.where(tap_ok, taps, 0.0).astype(jnp.float32)


@tpu_jit(static_argnames=("interpret", "mxu_vert", "raw", "th"))
def dog_and_mask_pallas(
    img: jnp.ndarray,
    kernels: jnp.ndarray,
    thresh: float,
    edge_limit: float = 10.0,
    interpret: bool = False,
    mxu_vert: bool = False,
    raw: bool = False,
    th: int | None = None,
):
    """(dog (7, H, W) f32, mask (5, H, W) bool) for one octave.

    ``kernels``: (8, 9) Gaussian taps for this octave (PrepareLaplaceKernels,
    cudaSiftH.cu:439-458). The mask includes the dense edge-response
    prefilter (same semantics as ops.detect.extrema_mask with edge_limit).

    ``raw=True`` skips the output slice: dog comes back physically padded to
    (7, th*ceil(H/th), 128*ceil(W/128)) — rows beyond H and lanes beyond W
    hold valid clamp-to-edge blur values (never garbage). This is the layout
    ``refine_candidates_pallas(..., logical_shape=(H, W))`` DMAs from
    directly; slicing to (H, W) first would materialize a full HBM copy of
    the stack (~58 MB at 1080p) that no consumer needs.
    """
    h, w = img.shape
    # Narrow strips for wide images: the kernel's live working set (~38
    # strip-width arrays across the 8 blurs, 7 DoGs and the shared pools)
    # scales with th*w and exceeds Mosaic's scoped-VMEM budget at
    # th=16, w>2048 (seen at 1440p). ``th`` overrides the heuristic (the
    # kernel arithmetic is strip-height-agnostic — outputs are identical
    # for any th; see benchmarks/dog_th_ab.py).
    if th is None:
        th = TH if w <= 2048 else 8
    nstrips = -(-h // th)
    hp = th * (nstrips + 2)
    # dog is emitted at lane-rounded width: the tail lanes cost nothing
    # extra when w is already a lane multiple (every bundled config) and
    # carry clamp-padded values otherwise.
    wr = ((w + 127) // 128) * 128
    wp = ((wr + 10 + 127) // 128) * 128
    img_p = jnp.pad(
        img,
        ((th, hp - h - th), (5, wp - w - 5)),
        mode="edge",
    )
    ktab = jnp.zeros((8, 16), jnp.float32).at[:, :9].set(jnp.asarray(kernels))
    thr = jnp.asarray([thresh, edge_limit], jnp.float32)
    dims = jnp.asarray([h, w], jnp.int32)

    band_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] if mxu_vert else []
    )
    band_args = [_vert_band(kernels, th)] if mxu_vert else []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # thr, dims
        grid=(nstrips,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),              # kernels
            *band_specs,                                        # vert band
            pl.BlockSpec((th, wp), lambda i, *_: (i, 0)),       # rows block 0
            pl.BlockSpec((th, wp), lambda i, *_: (i + 1, 0)),   # rows block 1
            pl.BlockSpec((th, wp), lambda i, *_: (i + 2, 0)),   # rows block 2
        ],
        out_specs=(
            pl.BlockSpec((7, th, wr), lambda i, *_: (0, i, 0)),
            pl.BlockSpec((5, th, wr), lambda i, *_: (0, i, 0)),
        ),
    )
    dog, mask = pl.pallas_call(
        functools.partial(_kernel_entry, th=th, mxu_vert=mxu_vert),
        out_shape=(
            jax.ShapeDtypeStruct((7, th * nstrips, wr), jnp.float32),
            jax.ShapeDtypeStruct((5, th * nstrips, wr), jnp.bfloat16),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(thr, dims, ktab, *band_args, img_p, img_p, img_p)
    # The interior test already zeroes mask lanes >= w, so the slice is pure
    # shape bookkeeping for the compaction stage.
    if raw:
        return dog, mask[:, :h, :w] != 0.0
    return dog[:, :h, :w], mask[:, :h, :w] != 0.0


def _kernel_entry(thr_ref, dims_ref, k_ref, *refs, th, mxu_vert):
    if mxu_vert:
        band_ref, a_ref, b_ref, c_ref, dog_ref, mask_ref = refs
    else:
        band_ref, (a_ref, b_ref, c_ref, dog_ref, mask_ref) = None, refs
    _dog_kernel(k_ref, a_ref, b_ref, c_ref, thr_ref, dims_ref,
                dog_ref, mask_ref, th=th, band_ref=band_ref)
