"""Fused orientation + descriptor Pallas kernel (batched, VMEM-resident).

TPU-native equivalent of the reference's wired-but-disabled
``OrientAndExtractCONST`` (cudaSiftD.cu:1060-1150, launch cudaSiftH.cu:384-395):
orientation assignment and descriptor extraction in ONE kernel, handling the
second-peak duplicate inline. This is the third-generation design; v1 (one
keypoint per step: DMA -> roll -> matmul -> serialized peak scan) measured
2.8 us/keypoint on TPU, v2 (VMEM-resident image, pairs per matmul, batched
histograms) 709 ns/keypoint. v3 restructures around measured facts
(benchmarks/{acquire_bench,mosaic_probe,fused_phase_ablation}.py):

1. **VMEM-resident image, no per-keypoint DMA.** The whole (padded) octave
   base is pinned in VMEM (~10 MB at 1080p vs ~16 MB VMEM); each keypoint's
   patch is an unaligned-sublane dynamic slice plus one lane roll — ~70 ns
   vs ~700 ns for the HBM DMA + realignment it replaces. Callers gate on
   image size (`fits_vmem`) and fall back to the split DMA kernels.

2. **Scale-bucketed patch geometry, up to FOUR keypoints per contraction.**
   The descriptor sample span is 7.96*scale + 1.5 around the keypoint, so
   octave-local scales <= 1.72 (measured ~96% of keypoints) fit a (32, 32)
   patch and pack 4-per-128-row MXU operand; the rest use a (48, 64) patch
   packed 2-per-operand (covers scales < 2.58). Phase-4 tent construction —
   the dominant in-kernel cost (+335 ns/kp of the v2 total, phase ablation)
   — is per-operand, so the small bucket halves it. The XLA wrapper
   stable-compacts each bucket, runs one kernel per geometry (count-gated:
   capacity padding is free), and scatters results back to slot order.

3. **Orientation grids: four keypoints per matmul in a (128, 128) tile.**
   The 13x13 window (+1 gradient halo) lives within rows/cols <= 29 of
   every patch geometry, so shifted patches narrow to (32, 32) and pack
   block-diagonally against stacked one-hot selectors (exact f32 via a
   bf16 hi/lo split of the bilinearly pre-shifted patch).

4. **Everything per-keypoint-scalar is batched across the block.** Gradient
   angles/weights, the 32-bin histograms' smoothing + peak finding +
   parabolic interpolation run on (32, B) / (B, 256) arrays for all B=16
   keypoints at once. Trilinear descriptor binning uses 8 lane-contracted
   matmuls against a shared spatial-weight matrix — EXACT in bf16 (every
   trilinear weight is a multiple of 1/64), so no hi/lo pair is needed —
   with the final permutation/L2-normalisation/masking done in XLA.

Arithmetic matches the split kernels (`ops/pallas/orient.py`,
`ops/pallas/descriptor.py`) which remain the independently-tested building
blocks and the DMA fallback: exact one-hot hi/lo selection for the
orientation grid, octant-reduced atan2, bf16 mean-centered tent sampling,
trilinear binning weights per cudaSiftD.cu:347-386. The small-bucket patch
has a different mean-centering window, so its descriptors differ from the
split kernels at the bf16 rounding level only; near image borders the
smaller margin shifts where the documented index-clamp deviation applies
(see ops/pallas/orient.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.jit import tpu_jit

from ..scan import lane_stack, mask_cumsum
from .orient import _atan2_poly
from .descriptor import _fast_atan2

B = 16       # keypoints per program
S = 1024     # descriptor samples: 256 grid points x 4 taps
SO = 256     # orientation lanes: 13x13 = 169 grid values, padded
OW = 32      # orientation window (rows/cols used by the 13x13 grid + halo)
NF = 8       # per-keypoint scalar fields in the prefetch table

# Patch geometries: (patch rows, patch cols, margin, keypoints per operand).
# margin >= 7.96*scale_max + 2.5 keeps every descriptor tap un-clamped.
GEOM_SMALL = (32, 32, 15, 4)   # octave-local scale <= SMALL_MAX_SCALE
GEOM_LARGE = (48, 64, 22, 2)   # scale < 2.58 (everything the refine emits)
SMALL_MAX_SCALE = 1.72

# Scalar-prefetch field indices (see `_keypoint_fields`).
F_LX0, F_LY0, F_FX, F_FY, F_S12, F_CBASE, F_RBASE, F_I2S2 = range(NF)

# Default VMEM budget for the resident image (bytes). ~16 MB physical per
# core; leave headroom for patches, packed matmuls and output blocks.
VMEM_IMAGE_LIMIT = 12 * 1024 * 1024

_PAD_R = GEOM_LARGE[0] + 8   # shared bottom padding covers both geometries
_PAD_C = 256


def fits_vmem(h: int, w: int) -> bool:
    """Whether an (h, w) f32 image (after edge padding) fits the resident-
    image budget. Callers should fall back to the split DMA kernels when
    this is False (e.g. >1440p octave bases)."""
    return (h + _PAD_R) * (w + _PAD_C) * 4 <= VMEM_IMAGE_LIMIT


def _spatial_weights():
    """Shared (16, 256) trilinear spatial weights W[(4*row_cell+col_cell), s]
    = wr*wc (cudaSiftD.cu:347-386). Every product is a multiple of 1/64
    below 1 — EXACT in bf16, so no hi/lo split is needed."""
    rc = jax.lax.broadcasted_iota(jnp.int32, (16, 256), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (16, 256), 1)
    gxs = (s % 16).astype(jnp.float32) - 7.5
    gys = (s // 16).astype(jnp.float32) - 7.5
    cy = jnp.floor((gys + 7.5 + 2.0) / 4.0) - 1.0
    fy = (gys + 7.5 - 1.5) / 4.0 - cy
    cx = jnp.floor((gxs + 7.5 + 2.0) / 4.0) - 1.0
    fx = (gxs + 7.5 - 1.5) / 4.0 - cx
    r = (rc // 4).astype(jnp.float32)
    c = (rc % 4).astype(jnp.float32)
    wr = (cy == r) * (1.0 - fy) + (cy + 1.0 == r) * fy
    wc = (cx == c) * (1.0 - fx) + (cx + 1.0 == c) * fx
    return (wr * wc).astype(jnp.bfloat16)


def _fused_kernel(
    oy_ref, ox_ref, ry_ref, rx_ref, cnts_ref, kpfs_ref,  # scalar prefetch
    img_ref, kpc_ref,                                # array inputs
    d1_ref, d2_ref, meta_ref,                        # outputs
    patf_s, pcs_s, patf_l, pcs_l,                    # per-geometry scratch
    gx_s, gy_s, gx_l, gy_l,                          # fast-gradient scratch
    vori, vall, vall2, metas, vrot,                  # shared scratch
    *, mode,
):
    """One kernel, both patch geometries: the keypoint table is laid out as
    [small bucket | pad to B | large bucket], and each block dispatches to
    the matching geometry body (``cnts_ref`` = [count_small, aligned small
    end, count_large]). A single grid avoids paying two full-capacity
    count-gated kernels when the buckets are unbalanced."""
    blk = pl.program_id(0)
    start = blk * B
    cnt_s = cnts_ref[0]
    cs_pad = cnts_ref[1]
    cnt_l = cnts_ref[2]
    small = start < cnt_s
    large = (start >= cs_pad) & (start < cs_pad + cnt_l)

    @pl.when(jnp.logical_not(small | large))
    def _():
        d1_ref[...] = jnp.zeros((1, B, 128), jnp.float32)
        d2_ref[...] = jnp.zeros((1, B, 128), jnp.float32)
        meta_ref[...] = jnp.zeros((1, 8, B), jnp.float32)

    @pl.when(small)
    def _():
        P, PW, _, pack = GEOM_SMALL
        _block_body(
            blk, oy_ref, ox_ref, ry_ref, rx_ref, kpfs_ref, img_ref, kpc_ref,
            d1_ref, d2_ref, meta_ref, patf_s, pcs_s, gx_s, gy_s, vori, vall,
            vall2, metas, vrot, P=P, PW=PW, pack=pack, mode=mode,
        )

    @pl.when(large)
    def _():
        P, PW, _, pack = GEOM_LARGE
        _block_body(
            blk, oy_ref, ox_ref, ry_ref, rx_ref, kpfs_ref, img_ref, kpc_ref,
            d1_ref, d2_ref, meta_ref, patf_l, pcs_l, gx_l, gy_l, vori, vall,
            vall2, metas, vrot, P=P, PW=PW, pack=pack, mode=mode,
        )


def _block_body(
    blk, oy_ref, ox_ref, ry_ref, rx_ref, kpfs_ref, img_ref, kpc_ref,
    d1_ref, d2_ref, meta_ref, patf, pcs, gxf, gyf, vori, vall, vall2, metas,
    vrot,
    *, P, PW, pack, mode,
):
    def kf(k, f):
        return kpfs_ref[(blk * B + k) * NF + f]

    # ---- Phase 1: acquire patches (VMEM slice + two realignment rolls). ----
    for k in range(B):
        i = blk * B + k
        oy = pl.multiple_of(oy_ref[i], 8)
        ox = pl.multiple_of(ox_ref[i], 128)
        ry = ry_ref[i]
        rx = rx_ref[i]
        raw = img_ref[pl.ds(oy, P + 8), pl.ds(ox, 256)]
        # Lane roll first, then narrow to PW columns BEFORE the row roll:
        # the row roll then touches PW/256 of the data (the rolls act on
        # independent axes, so the order is value-identical).
        a = pltpu.roll(raw, (256 - rx) % 256, axis=1)[:, :PW]
        a = pltpu.roll(a, (P + 8 - ry) % (P + 8), axis=0)[:P]
        patf[k] = a
        if mode == "exact":
            # Mean-centered bf16 copy: only the exact 4-tap sampler
            # contracts the raw patch against the tent (shift/fast contract
            # gradient fields, where the DC is already removed).
            pcs[k] = (a - jnp.mean(a)).astype(jnp.bfloat16)

    # ---- Phase 2: orientation value grids, FOUR keypoints per matmul. ----
    # The 13x13 window (+1 gradient halo) lives in rows/cols <= 29 of the
    # patch (cbase, rbase <= margin-6+7), so the shifted patch narrows to
    # (32, 32) and four keypoints pack block-diagonally into one full
    # (128, 128) MXU tile: one hi + one lo matmul per quad.
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (1, SO), 1)
    uy = lane_o // 13
    ux = lane_o - uy * 13
    win_ok = ((ux <= 10) & (uy <= 10) & (lane_o < 169)).astype(jnp.float32)
    sub128 = jax.lax.broadcasted_iota(jnp.int32, (4 * OW, SO), 0)
    qloc_o = sub128 % OW
    qblk_o = sub128 // OW
    zq = jnp.zeros((OW, OW), jnp.bfloat16)

    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, 4 * OW), 1) // OW

    for j in range(B // 4):
        ks = [4 * j + t for t in range(4)]

        def qsel(vals, blk_idx):
            out = vals[3]
            for t in (2, 1, 0):
                out = jnp.where(blk_idx == t, vals[t], out)
            return out

        if P == OW and PW == OW:
            # Lane-stacked quad shift: the four (32,32) patches concatenate
            # along lanes into ONE (32,128) array, so the bilinear shift
            # runs at full VPU lane utilization (a (32,32) op occupies the
            # same 4 register tiles at 25% fill). The rolls wrap values
            # across patch boundaries only into row/col 31 of each block —
            # outside the 13x13+halo window (rows/cols <= 22).
            st = jnp.concatenate([patf[k] for k in ks], axis=1)  # (32, 128)
            fxv = qsel([kf(k, F_FX) for k in ks], lane4)
            fyv = qsel([kf(k, F_FY) for k in ks], lane4)
            a_x = pltpu.roll(st, 4 * OW - 1, axis=1)
            a_y = pltpu.roll(st, OW - 1, axis=0)
            a_xy = pltpu.roll(a_x, OW - 1, axis=0)
            pi = (1.0 - fyv) * ((1.0 - fxv) * st + fxv * a_x) + fyv * (
                (1.0 - fxv) * a_y + fxv * a_xy
            )
            hi_st = pi.astype(jnp.bfloat16)
            lo_st = (pi - hi_st.astype(jnp.float32)).astype(jnp.bfloat16)

            def bd4(stacked):
                # Row-block t keeps only col-block t: the same block
                # diagonal the per-patch concat construction builds.
                zb = jnp.zeros_like(stacked)
                return jnp.concatenate(
                    [jnp.where(lane4 == t, stacked, zb) for t in range(4)],
                    axis=0,
                )                                                # (128, 128)

            ahi = bd4(hi_st)
            alo = bd4(lo_st)
        else:
            his = []
            los = []
            for k in ks:
                fx = kf(k, F_FX)
                fy = kf(k, F_FY)
                a = patf[k]
                # One f32 bilinear shift by (fy, fx): afterwards every
                # orientation tap is an integer-grid read (exact tex2D
                # semantics for interior keypoints; border taps clamp the
                # integer index).
                a_x = pltpu.roll(a, PW - 1, axis=1)
                a_y = pltpu.roll(a, P - 1, axis=0)
                a_xy = pltpu.roll(a_x, P - 1, axis=0)
                pi = (1.0 - fy) * ((1.0 - fx) * a + fx * a_x) + fy * (
                    (1.0 - fx) * a_y + fx * a_xy
                )
                pw = pi[:OW, :OW]
                hi = pw.astype(jnp.bfloat16)
                his.append(hi)
                los.append((pw - hi.astype(jnp.float32)).astype(jnp.bfloat16))

            def bdq(blocks):
                rows_ = []
                for t in range(4):
                    pre = [zq] * t
                    post = [zq] * (3 - t)
                    rows_.append(
                        jnp.concatenate(pre + [blocks[t]] + post, axis=1))
                return jnp.concatenate(rows_, axis=0)            # (128, 128)

            ahi = bdq(his)
            alo = bdq(los)

        cols = [
            jnp.clip(kf(k, F_CBASE).astype(jnp.int32) + ux, 0, OW - 1)
            for k in ks
        ]
        colsel = jnp.where(
            qblk_o == 0, cols[0],
            jnp.where(qblk_o == 1, cols[1],
                      jnp.where(qblk_o == 2, cols[2], cols[3])))
        onec = (qloc_o == colsel).astype(jnp.bfloat16)           # (128, SO)

        t4 = jax.lax.dot_general(
            ahi, onec, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            alo, onec, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                        # (128, SO)
        rows = [
            jnp.clip(kf(k, F_RBASE).astype(jnp.int32) + uy, 0, OW - 1)
            for k in ks
        ]
        rowsel = jnp.where(
            qblk_o == 0, rows[0],
            jnp.where(qblk_o == 1, rows[1],
                      jnp.where(qblk_o == 2, rows[2], rows[3])))
        oner = (qloc_o == rowsel).astype(jnp.float32)
        m = oner * t4
        for t, k in enumerate(ks):
            vori[k : k + 1] = jnp.sum(
                m[t * OW : (t + 1) * OW], axis=0, keepdims=True)

    # ---- Phase 3: batched histograms + peak finding for the block. ----
    v = vori[...]                                                # (B, SO)
    dx = pltpu.roll(v, SO - 15, axis=1) - pltpu.roll(v, SO - 13, axis=1)
    dy = pltpu.roll(v, SO - 27, axis=1) - pltpu.roll(v, SO - 1, axis=1)
    theta = _atan2_poly(dy, dx)
    bbin = jnp.floor(16.0 * theta / 3.1416 + 16.5).astype(jnp.int32)
    bbin = jnp.where(bbin > 31, 0, bbin).astype(jnp.float32)
    i2s2 = kpc_ref[0, :, F_I2S2 : F_I2S2 + 1]                    # (B, 1)
    dist2 = ((ux.astype(jnp.float32) - 5.0) ** 2
             + (uy.astype(jnp.float32) - 5.0) ** 2)
    w = jnp.sqrt(dx * dx + dy * dy) * jnp.exp(i2s2 * dist2) * win_ok

    csub = jax.lax.broadcasted_iota(
        jnp.int32, (32, 1), 0).astype(jnp.float32)
    hist_cols = []
    for k in range(B):
        oh = (csub == bbin[k : k + 1]).astype(jnp.float32)       # (32, SO)
        hist_cols.append(
            jnp.sum(w[k : k + 1] * oh, axis=1, keepdims=True))
    hist = jnp.concatenate(hist_cols, axis=1)                    # (32, B)

    # Smooth [1,4,6,4,1] circular + peaks (cudaSiftD.cu:1009-1037), matching
    # ops.orient.histogram_peaks bin for bin, for all B keypoints at once.
    sm = (
        6.0 * hist
        + 4.0 * (pltpu.roll(hist, 1, axis=0) + pltpu.roll(hist, 31, axis=0))
        + pltpu.roll(hist, 2, axis=0)
        + pltpu.roll(hist, 30, axis=0)
    )
    left = pltpu.roll(sm, 1, axis=0)
    right = pltpu.roll(sm, 31, axis=0)
    peaks = jnp.where((sm > left) & (sm >= right), sm, 0.0)
    max1 = jnp.max(peaks, axis=0, keepdims=True)                 # (1, B)
    i1 = jnp.min(jnp.where(peaks == max1, csub, 32.0), axis=0, keepdims=True)
    masked = jnp.where(csub == i1, -jnp.inf, peaks)
    max2 = jnp.max(masked, axis=0, keepdims=True)
    i2 = jnp.min(jnp.where(masked == max2, csub, 32.0), axis=0, keepdims=True)

    def interp(i, m):
        ip = jnp.where(i >= 31.0, i - 31.0, i + 1.0)
        im = jnp.where(i < 1.0, i + 31.0, i - 1.0)
        v1 = jnp.sum(jnp.where(csub == ip, sm, 0.0), axis=0, keepdims=True)
        v2 = jnp.sum(jnp.where(csub == im, sm, 0.0), axis=0, keepdims=True)
        denom = 2.0 * m - v1 - v2
        peak = i + 0.5 * (v1 - v2) / jnp.where(denom == 0.0, 1e-30, denom)
        return 11.25 * jnp.where(peak < 0.0, peak + 32.0, peak)

    ori1 = interp(i1, max1)                                      # (1, B)
    ori2 = interp(i2, max2)
    has2 = (max2 > 0.8 * max1).astype(jnp.float32)
    metas[0:1, :] = ori1
    metas[1:2, :] = ori2
    metas[2:3, :] = has2
    meta = jnp.concatenate(
        [ori1, ori2, has2, jnp.zeros((5, B), jnp.float32)], axis=0)
    meta_ref[0] = meta

    # ---- Phase 4: descriptor sampling, `pack` keypoints per matmul. ----
    # In shift/fast mode the sample axis is the 256 grid points (gradient
    # FIELDS share one tent); in exact mode it is 256 grid points x 4 taps.
    SS = S if mode == "exact" else 256
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, SS), 1)
    tap = lane_s // 256
    rem = lane_s - tap * 256
    gy = (rem // 16).astype(jnp.float32) - 7.5
    gx = (rem - (rem // 16) * 16).astype(jnp.float32) - 7.5
    # Rotated unit gradient taps (cudaSiftD.cu:340-343): tap 0..3 offsets are
    # (+c,+s), (-c,-s), (-s,+c), (+s,-c); folded into two +-1/0 tap masks.
    ta = jnp.where(tap == 0, 1.0, jnp.where(tap == 1, -1.0, 0.0))  # (1, SS)
    tc = jnp.where(tap == 2, 1.0, jnp.where(tap == 3, -1.0, 0.0))
    qloc1 = jax.lax.broadcasted_iota(
        jnp.int32, (PW, SS), 0).astype(jnp.float32)
    ploc1 = jax.lax.broadcasted_iota(
        jnp.int32, (P, SS), 0).astype(jnp.float32)
    zpat = jnp.zeros((P, PW), jnp.bfloat16)

    lane_pk = jax.lax.broadcasted_iota(
        jnp.int32, (1, pack * PW), 1) // PW                      # (1, 128)

    if mode == "fast":
        # Opt-in approximation (grad_mode="fast"): central-difference
        # gradient fields, sampled once per grid point (256 lanes, shared
        # tent for gx/gy) and rotated batched in the finish stage —
        # replaces the 4 bilinear taps per sample. Deviates from
        # interpolate-then-difference by O(h^2) curvature terms AND an
        # axis-misaligned gradient frame. The fields are computed on the
        # group's lane-concatenated patch stack (full VPU lanes, like the
        # phase-2 shift); roll wrap-around lands only in row/col 0 and
        # P-1/PW-1 of each block, which the sample clip keeps at zero
        # tent weight.
        for j in range(B // pack):
            sts = jnp.concatenate(
                [patf[pack * j + t] for t in range(pack)], axis=1
            )                                                    # (P, 128)
            gxf[j] = (pltpu.roll(sts, pack * PW - 1, axis=1)
                      - pltpu.roll(sts, 1, axis=1)).astype(jnp.bfloat16)
            gyf[j] = (pltpu.roll(sts, P - 1, axis=0)
                      - pltpu.roll(sts, 1, axis=0)).astype(jnp.bfloat16)

    def sample_coords(k, ori_deg):
        lx0 = kf(k, F_LX0)
        ly0 = kf(k, F_LY0)
        s12 = kf(k, F_S12)
        th = jnp.float32(2.0 * 3.1415 / 360.0) * ori_deg
        cosa = jnp.cos(th)
        sina = jnp.sin(th)
        xs = lx0 + gx * (s12 * cosa) - gy * (s12 * sina) + 0.5
        ys = ly0 + gx * (s12 * sina) + gy * (s12 * cosa) + 0.5
        if mode == "exact":
            tapx = cosa * ta - sina * tc
            tapy = sina * ta + cosa * tc
            sx = jnp.clip(xs + tapx - 0.5, 0.0, PW - 1.0)
            sy = jnp.clip(ys + tapy - 0.5, 0.0, P - 1.0)
        else:
            # Keep samples off the roll-wrapped border rows/cols. For
            # in-range keypoints the clip is inert: the margins bound the
            # grid reach to <= P-2 before the field rolls add their +-1
            # (the +-1 lives INSIDE the field here, not in the tent).
            sx = jnp.clip(xs - 0.5, 1.0, PW - 2.0)
            sy = jnp.clip(ys - 0.5, 1.0, P - 2.0)
        return sx, sy, cosa, sina

    def bdiag(mats):
        rows_ = []
        for t in range(pack):
            pre = [zpat] * t
            post = [zpat] * (pack - 1 - t)
            rows_.append(jnp.concatenate(pre + [mats[t]] + post, axis=1))
        return jnp.concatenate(rows_, axis=0)            # (pack*P, pack*PW)

    def desc_group(j, ori_row, dst):
        ks = [pack * j + t for t in range(pack)]
        # Build each keypoint's (PW, SS)/(P, SS) tent block directly and
        # concatenate along rows, instead of where-selecting per-keypoint
        # coordinate rows into full (pack*P(W), SS) arrays first: the tent
        # arithmetic then runs on 1/pack-sized arrays (same element values,
        # bit-identical concat result) and the pack-1 full-size select
        # passes disappear — phase 4 is the kernel's dominant cost
        # (trace ablation: 360 of 535 ns/kp).
        colks, rowks, cosas, sinas = [], [], [], []
        for k in ks:
            sx, sy, cosa, sina = sample_coords(k, metas[ori_row, k])
            colks.append(jnp.maximum(
                0.0, 1.0 - jnp.abs(qloc1 - sx)).astype(jnp.bfloat16))
            rowks.append(jnp.maximum(0.0, 1.0 - jnp.abs(ploc1 - sy)))
            cosas.append(cosa)
            sinas.append(sina)
        cols = jnp.concatenate(colks, axis=0)            # (pack*PW, SS)
        rowt = jnp.concatenate(rowks, axis=0)            # (pack*P, SS)
        if mode == "shift":
            # Rotation-aligned gradient FIELDS via fractional patch shifts:
            #   Dx = S_{(+sina,+cosa)}(I) - S_{(-sina,-cosa)}(I)
            #   Dy = S_{(+cosa,-sina)}(I) - S_{(-cosa,+sina)}(I)
            # where S_{(dy,dx)} samples the patch bilinearly at a (dy, dx)
            # offset — exactly the reference's 4 rotated unit taps
            # (cudaSiftD.cu:340-343) lifted from per-sample to per-field.
            # S is separable 3-tap hat weights (offsets in [-1, 1]), so
            # both fields are 9 lane-selected FMAs over 8 shared rolls of
            # the group's lane-concatenated patch stack; ONE 256-lane tent
            # then samples them (the tent+matmul run at 1/4 and 1/2 of the
            # exact path's size — phase 4 is the kernel's dominant cost).
            # vs exact: the tap value is bilinear-of-bilinear (the hat
            # pair convolves into a 2 px kernel) — pure extra smoothing,
            # with the gradient axis exactly rotation-aligned (unlike
            # mode="fast", whose central differences live in the unrotated
            # frame). Roll wrap-around lands only in row/col 0 and
            # P-1/PW-1 of each block, which the sample clip keeps at zero
            # tent weight.
            sts = jnp.concatenate(
                [patf[pack * j + t] for t in range(pack)], axis=1
            )                                            # (P, pack*PW)
            cm = pltpu.roll(sts, 1, axis=1)              # reads col-1
            cp = pltpu.roll(sts, pack * PW - 1, axis=1)  # reads col+1
            rolls = {}
            for jc, b_ in ((-1, cm), (0, sts), (1, cp)):
                rolls[(0, jc)] = b_
                rolls[(-1, jc)] = pltpu.roll(b_, 1, axis=0)      # row-1
                rolls[(1, jc)] = pltpu.roll(b_, P - 1, axis=0)   # row+1

            def hat(d):
                # 3-tap hat weights of a fractional offset d in [-1, 1]:
                # S_d(v)[i] = sum_t hat(d)[t+1] * v[i+t].
                return [jnp.maximum(0.0, 1.0 - jnp.abs(d - o))
                        for o in (-1.0, 0.0, 1.0)]

            # Per-keypoint scalar weights W[jr][jc] for each field; note
            # hat(-d)[t] = hat(d)[-t], so one hat per cos/sin serves both
            # the + and - shifts.
            wx_k, wy_k = [], []
            for t in range(pack):
                hc = hat(cosas[t])
                hs = hat(sinas[t])
                wx_k.append({
                    (jr, jc): hs[jr + 1] * hc[jc + 1]
                    - hs[1 - jr] * hc[1 - jc]
                    for jr in (-1, 0, 1) for jc in (-1, 0, 1)
                })
                wy_k.append({
                    (jr, jc): hc[jr + 1] * hs[1 - jc]
                    - hc[1 - jr] * hs[jc + 1]
                    for jr in (-1, 0, 1) for jc in (-1, 0, 1)
                })

            def lsel(vals):
                # pack scalars -> (1, pack*PW) lane-blocked row vector.
                out = jnp.full((1, pack * PW), vals[pack - 1], jnp.float32)
                for t in range(pack - 2, -1, -1):
                    out = jnp.where(lane_pk == t, vals[t], out)
                return out

            gxs_f = jnp.zeros((P, pack * PW), jnp.float32)
            gys_f = jnp.zeros((P, pack * PW), jnp.float32)
            for jr in (-1, 0, 1):
                for jc in (-1, 0, 1):
                    r_ = rolls[(jr, jc)]
                    gxs_f += lsel([wx_k[t][(jr, jc)]
                                   for t in range(pack)]) * r_
                    gys_f += lsel([wy_k[t][(jr, jc)]
                                   for t in range(pack)]) * r_

            def bdg(stacked):
                zb = jnp.zeros_like(stacked)
                return jnp.concatenate(
                    [jnp.where(lane_pk == t, stacked, zb)
                     for t in range(pack)],
                    axis=0,
                )                                        # (pack*P, pack*PW)

            t_gx = jax.lax.dot_general(
                bdg(gxs_f.astype(jnp.bfloat16)), cols,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # (pack*P, 256)
            t_gy = jax.lax.dot_general(
                bdg(gys_f.astype(jnp.bfloat16)), cols,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            mgx = rowt * t_gx
            mgy = rowt * t_gy
            for t, k in enumerate(ks):
                # Already rotation-aligned: finish() consumes the two
                # halves as (dx, dy) directly, no post-rotation.
                dst[k : k + 1, 0:256] = jnp.sum(
                    mgx[t * P : (t + 1) * P], axis=0, keepdims=True)
                dst[k : k + 1, 256:512] = jnp.sum(
                    mgy[t * P : (t + 1) * P], axis=0, keepdims=True)
        elif mode == "fast":
            # Block-diagonalize the group's stacked gradient fields by
            # lane masking (same construction as the phase-2 bd4).
            def bdg(stacked):
                zb = jnp.zeros_like(stacked)
                return jnp.concatenate(
                    [jnp.where(lane_pk == t, stacked, zb)
                     for t in range(pack)],
                    axis=0,
                )                                        # (pack*P, 128)

            t_gx = jax.lax.dot_general(
                bdg(gxf[j]), cols, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # (pack*P, 256)
            t_gy = jax.lax.dot_general(
                bdg(gyf[j]), cols, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            mgx = rowt * t_gx
            mgy = rowt * t_gy
            for t, k in enumerate(ks):
                # Unrotated field sums in the two halves; finish() rotates
                # them into the keypoint frame batched over the block,
                # using the per-keypoint cos/sin staged in vrot.
                dst[k : k + 1, 0:256] = jnp.sum(
                    mgx[t * P : (t + 1) * P], axis=0, keepdims=True)
                dst[k : k + 1, 256:512] = jnp.sum(
                    mgy[t * P : (t + 1) * P], axis=0, keepdims=True)
                vrot[k : k + 1, 2 * ori_row : 2 * ori_row + 1] = jnp.full(
                    (1, 1), cosas[t], jnp.float32)
                vrot[k : k + 1, 2 * ori_row + 1 : 2 * ori_row + 2] = jnp.full(
                    (1, 1), sinas[t], jnp.float32)
        else:
            apc = bdiag([pcs[k] for k in ks])
            t_ = jax.lax.dot_general(
                apc, cols, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                    # (pack*P, S)
            m = rowt * t_
            for t, k in enumerate(ks):
                dst[k : k + 1] = jnp.sum(
                    m[t * P : (t + 1) * P], axis=0, keepdims=True)

    for j in range(B // pack):
        desc_group(j, 0, vall)

        group_has2 = metas[2, pack * j] > 0.5
        for t in range(1, pack):
            group_has2 = group_has2 | (metas[2, pack * j + t] > 0.5)

        @pl.when(group_has2)
        def _(j=j):
            desc_group(j, 1, vall2)

        @pl.when(jnp.logical_not(group_has2))
        def _(j=j):
            vall2[pack * j : pack * (j + 1)] = jnp.zeros(
                (pack, S), jnp.float32)

    # ---- Phase 5: batched binning via shared spatial-weight matmuls. ----
    whi = _spatial_weights()
    lane256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    gxs = (lane256 % 16).astype(jnp.float32) - 7.5
    gys = (lane256 // 16).astype(jnp.float32) - 7.5
    gweight = jnp.exp(-(gxs * gxs + gys * gys) / 128.0)

    def finish(vals, dref, row):
        if mode == "fast":
            # Rotate the sampled gradient-field sums into each keypoint's
            # frame, batched over the block (cos/sin staged per keypoint).
            cosv = vrot[:, 2 * row : 2 * row + 1]                # (B, 1)
            sinv = vrot[:, 2 * row + 1 : 2 * row + 2]
            sgx = vals[:, 0:256]
            sgy = vals[:, 256:512]
            dxv = cosv * sgx + sinv * sgy                        # (B, 256)
            dyv = cosv * sgy - sinv * sgx
        elif mode == "shift":
            # The shift fields are already rotation-aligned.
            dxv = vals[:, 0:256]                                 # (B, 256)
            dyv = vals[:, 256:512]
        else:
            dxv = vals[:, 0:256] - vals[:, 256:512]              # (B, 256)
            dyv = vals[:, 512:768] - vals[:, 768:1024]
        grad = jnp.sqrt(dxv * dxv + dyv * dyv) * gweight
        angf = 4.0 / 3.1415 * _fast_atan2(dyv, dxv) + 4.0
        angi_raw = jnp.floor(angf)
        frac = angf - angi_raw
        angi = (angi_raw.astype(jnp.int32) % 8).astype(jnp.float32)
        angp = jnp.where(angi == 7.0, 0.0, angi + 1.0)
        g1 = grad * (1.0 - frac)
        g2 = grad * frac
        out = []
        for a in range(8):
            af = jnp.float32(a)
            ga = ((angi == af) * g1 + (angp == af) * g2).astype(jnp.bfloat16)
            # (B, 256) @ (16, 256)^T -> (B, 16): keypoints along SUBLANES,
            # descriptor cells along lanes, so the kernel emits (B, 128)
            # blocks in the orientation the XLA wrapper consumes — the
            # transposed (128, B) form forced a 17.7 us relayout copy of
            # every output at the big octaves (trace, fusion budget).
            da = jax.lax.dot_general(
                ga, whi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                    # (B, 16)
            out.append(da)
        # Lane layout d' = a*16 + rc per keypoint row; the XLA wrapper
        # permutes lanes to the reference order d = 8*rc + a. The two-stage
        # normalization (L2 -> clamp 0.2 -> L2, cudaSiftD.cu:390-409) is
        # lane-permutation-invariant, so it runs HERE on the (B, 128)
        # block — the wrapper previously re-read every capacity-width
        # descriptor table twice for it (4 full passes per frame).
        d = jnp.concatenate(out, axis=1)                         # (B, 128)
        n1 = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(d * d, axis=1, keepdims=True), 1e-30))
        t1 = jnp.minimum(d * n1, 0.2)
        n2 = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(t1 * t1, axis=1, keepdims=True), 1e-30))
        dref[0] = t1 * n2

    finish(vall[...], d1_ref, 0)

    # Second-peak descriptors only exist where phase 3 saw a qualifying
    # second histogram peak; skip the whole second binning (and in XLA the
    # d2 consumer masks by has2 anyway) when no keypoint in the block has
    # one. metas[2] may hold garbage for slots past the live count — same
    # exposure as the per-group gate in phase 4, and equally harmless: the
    # wrapper masks d2 by (live & has2).
    any2 = jnp.max(metas[2:3, :]) > 0.5

    @pl.when(any2)
    def _():
        finish(vall2[...], d2_ref, 1)

    @pl.when(jnp.logical_not(any2))
    def _():
        d2_ref[...] = jnp.zeros((1, B, 128), jnp.float32)


def _call_kernel(img, xpos, ypos, scale, margins, cnts, interpret, mode):
    """Invoke the two-geometry kernel on a bucket-ordered keypoint table.

    ``img`` must already carry the shared (_PAD_R, _PAD_C) edge padding;
    ``margins`` holds each table position's patch margin (geometry-matched
    to the block dispatch driven by ``cnts`` = [cnt_small, aligned small
    end, cnt_large]). Returns the raw blocked kernel outputs.
    """
    n = xpos.shape[0]
    fl_x = jnp.floor(xpos)
    fl_y = jnp.floor(ypos)
    o_y = jnp.maximum(fl_y.astype(jnp.int32) - margins, 0)
    o_x = jnp.maximum(fl_x.astype(jnp.int32) - margins, 0)
    oy = o_y // 8 * 8
    ry = o_y - oy
    ox = o_x // 128 * 128
    rx = o_x - ox
    i2sigma2 = -1.0 / (2.0 * 1.5 * 1.5 * scale * scale)
    fields = lane_stack(
        [
            xpos - o_x.astype(jnp.float32),            # F_LX0
            ypos - o_y.astype(jnp.float32),            # F_LY0
            xpos - fl_x,                               # F_FX
            ypos - fl_y,                               # F_FY
            (12.0 / 16.0) * scale,                     # F_S12
            fl_x - o_x.astype(jnp.float32) - 6.0,      # F_CBASE
            fl_y - o_y.astype(jnp.float32) - 6.0,      # F_RBASE
            i2sigma2,                                  # F_I2S2
        ],
    )                                                  # (n, NF)
    kpfs = fields.reshape(-1)
    kpc = fields.reshape(n // B, B, NF)

    P_s, PW_s, _, _ = GEOM_SMALL
    P_l, PW_l, _, _ = GEOM_LARGE
    nb = n // B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, NF), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, B, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, B, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 8, B), lambda i, *_: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, P_s, PW_s), jnp.float32),   # patf_s
            pltpu.VMEM((B, P_s, PW_s), jnp.bfloat16),  # pcs_s
            pltpu.VMEM((B, P_l, PW_l), jnp.float32),   # patf_l
            pltpu.VMEM((B, P_l, PW_l), jnp.bfloat16),  # pcs_l
            pltpu.VMEM((B // 4, P_s, 4 * PW_s), jnp.bfloat16),  # gx_s
            pltpu.VMEM((B // 4, P_s, 4 * PW_s), jnp.bfloat16),  # gy_s
            pltpu.VMEM((B // 2, P_l, 2 * PW_l), jnp.bfloat16),  # gx_l
            pltpu.VMEM((B // 2, P_l, 2 * PW_l), jnp.bfloat16),  # gy_l
            pltpu.VMEM((B, SO), jnp.float32),          # vori
            pltpu.VMEM((B, S), jnp.float32),           # vall
            pltpu.VMEM((B, S), jnp.float32),           # vall2
            pltpu.VMEM((8, B), jnp.float32),           # metas
            pltpu.VMEM((B, 128), jnp.float32),         # vrot
        ],
    )
    vmem_limit = img.shape[0] * img.shape[1] * 4 + 3 * 1024 * 1024
    return pl.pallas_call(
        functools.partial(_fused_kernel, mode=mode),
        out_shape=(
            jax.ShapeDtypeStruct((nb, B, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, B, 128), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit),
        ),
    )(
        oy, ox, ry, rx, cnts, kpfs,
        img, kpc,
    )


def fused_tiles(h: int, w: int, max_tiles: int = 4) -> int | None:
    """Number of y-tiles needed to run the fused kernel on an (h, w) image
    with each tile's VMEM-resident slice inside budget, or None if even
    ``max_tiles`` strips don't fit (callers then use the split DMA path)."""
    t = 1
    while t <= max_tiles:
        if fits_vmem(-(-h // t) + _TILE_TOP + _TILE_BOT, w):
            return t
        t *= 2
    return None


# Interior-tile overlap: keypoints read up to 29 rows above floor(y) and 34
# below (patch origin max(floor(y) - margin, 0) snapped down to 8, then
# P + 8 rows), so tiles extend 32 up / 40 down into their neighbors.
_TILE_TOP = 32
_TILE_BOT = 40


def _run_table(img_padded, xpos, ypos, scale, live, interpret, mode):
    """Bucket-compact `live` keypoints by scale, run the two-geometry
    kernel, and scatter results back to slot order (zeros elsewhere).

    ``img_padded`` must already carry the (_PAD_R, _PAD_C) edge padding;
    ``ypos`` is local to it. Returns 5 slot-order arrays (desc1, desc2,
    ori1, ori2, has2-as-f32).
    """
    n = xpos.shape[0]
    nc = n + B   # bucket table capacity: +B absorbs the alignment gap
    slots = jnp.arange(n)
    is_small = live & (scale <= SMALL_MAX_SCALE)
    is_large = live & jnp.logical_not(scale <= SMALL_MAX_SCALE)

    pos_s = mask_cumsum(is_small) - 1
    cnt_s = jnp.maximum(pos_s[-1] + 1, 0).astype(jnp.int32)
    pos_l = mask_cumsum(is_large) - 1
    cnt_l = jnp.maximum(pos_l[-1] + 1, 0).astype(jnp.int32)
    cs_pad = (cnt_s + B - 1) // B * B

    # Table position of each slot; dead slots drop out of the scatter.
    bucket_pos = jnp.where(
        is_small, pos_s, jnp.where(is_large, cs_pad + pos_l, nc)
    )
    # idx[j] = source slot of table position j (0 for gap/padding rows).
    idx = jnp.zeros((nc,), jnp.int32).at[bucket_pos].set(slots, mode="drop")
    jpos = jnp.arange(nc)
    live_pos = (jpos < cnt_s) | ((jpos >= cs_pad) & (jpos < cs_pad + cnt_l))
    # One stacked row gather instead of three scalar gathers (scalar 1-D
    # gathers cost ~20 ns/element on TPU; 12-byte rows amortize).
    pts = lane_stack([xpos, ypos, scale])[idx]            # (nc, 3)
    bx = pts[:, 0]
    by = pts[:, 1]
    bs = jnp.where(live_pos, pts[:, 2], 1.0)
    margins = jnp.where(jpos < cs_pad, GEOM_SMALL[2], GEOM_LARGE[2])
    cnts = jnp.stack([cnt_s, cs_pad, cnt_l])

    d1, d2, meta = _call_kernel(img_padded, bx, by, bs, margins, cnts,
                                interpret, mode)

    # Kernel rows are a*16 + rc; the reference descriptor index is
    # d = 8*rc + a (cudaSiftD.cu:347-386 bin layout).
    d = jnp.arange(128)
    perm = (d % 8) * 16 + d // 8
    valid = live_pos[:, None]

    def unpack(raw):
        # The L2 -> clamp 0.2 -> L2 normalization (cudaSiftD.cu:390-409)
        # runs inside the kernel's finish() — permutation-invariant, so it
        # is valid in the kernel's a*16+rc lane order. Here: permute lanes
        # to the reference order and zero dead rows.
        return jnp.where(valid, raw.reshape(nc, 128)[:, perm], 0.0)

    meta = meta.transpose(0, 2, 1).reshape(nc, 8)
    has2_pos = live_pos & (meta[:, 2] > 0.5)
    # A group where only some keypoints have a second peak computes every
    # member's second descriptor; mask the invalid siblings.
    d1s = unpack(d1)
    d2s = jnp.where(has2_pos[:, None], unpack(d2), 0.0)

    # Table order -> slot order is a pure GATHER: bucket_pos maps each slot
    # to its table row (TPU scatters serialize per element — the scatter
    # form here cost 0.5 ms of the 1080p extraction). Dead slots index the
    # out-of-range sentinel, clamp to some row, and are masked off.
    lv = live[:, None]
    g1 = jnp.where(lv, d1s[bucket_pos], 0.0)
    g2 = jnp.where(lv, d2s[bucket_pos], 0.0)
    gm = jnp.where(lv, meta[bucket_pos], 0.0)            # (n, 8)
    ghas2 = jnp.where(live, gm[:, 2] > 0.5, False)
    return (
        g1,
        g2,
        jnp.where(live, gm[:, 0], 0.0),
        jnp.where(live, gm[:, 1], 0.0),
        ghas2.astype(jnp.float32),
    )


@tpu_jit(static_argnames=("interpret", "fast", "mode"))
def orient_and_describe_pallas(
    img: jnp.ndarray,
    xpos: jnp.ndarray,
    ypos: jnp.ndarray,
    scale: jnp.ndarray,
    interpret: bool = False,
    count: jnp.ndarray | None = None,
    fast: bool = False,
    mode: str | None = None,
    live: jnp.ndarray | None = None,
):
    """Fused orientation + descriptors for ``count`` live keypoints.

    ``live``: optional (N,) bool mask selecting live slots directly —
    supersedes ``count`` (which means "the first count slots"). The bucket
    compaction inside is mask-driven, so scattered validity costs exactly
    what front-packed validity does; callers can skip their own
    pre-compaction (saves a measured ~0.5 ms/frame of stable-compact
    gathers at 1080p).

    Returns (desc1 (N, 128), desc2 (N, 128), ori1 (N,), ori2 (N,),
    has2 (N,) bool). ``desc2``/``ori2`` are the second-peak duplicates,
    valid where ``has2``.

    ``mode`` selects the descriptor gradient sampler (phase 4):
      "exact" — 4 bilinear taps per sample, the reference arithmetic
                (cudaSiftD.cu:337-343);
      "shift" — rotation-aligned gradient fields from fractional
                +-(cos a, sin a) patch shifts + one shared 256-lane tent
                (half the phase-4 matmul, a quarter of the tent build);
                differs from exact by double-bilinear smoothing only;
      "fast"  — unrotated central-difference fields, rotated after
                sampling (cheapest; axis-misaligned, biggest deviation).
    ``fast=True`` is the legacy alias for mode="fast".

    Keypoints are stable-compacted into a [small | large] bucket layout by
    octave-local scale (<= SMALL_MAX_SCALE -> 4-packed (32,32) patches,
    else 2-packed (48,64)); ONE kernel dispatches the matching geometry per
    block (count-gated: capacity padding is free), and the results scatter
    back to slot order.

    Images too large to pin in VMEM whole run in `fused_tiles(h, w)`
    horizontal tiles: each tile's slice (plus the 32/40-row patch overlap)
    is pinned, and keypoints route to their tile by row — identical
    arithmetic, since every patch a keypoint reads lies inside its tile's
    extended slice. The caller must check ``fused_tiles`` is not None.
    """
    if mode is None:
        mode = "fast" if fast else "exact"
    if mode not in ("exact", "shift", "fast"):
        raise ValueError(f"mode must be exact|shift|fast, got {mode!r}")
    n_in = xpos.shape[0]
    if live is not None and live.shape != (n_in,):
        raise ValueError(f"live shape {live.shape} != ({n_in},)")
    if count is None:
        count = jnp.int32(n_in)
    count = jnp.asarray(count, jnp.int32)
    pad = (-n_in) % B
    if pad:
        xpos, ypos, scale = (jnp.pad(a, (0, pad)) for a in (xpos, ypos, scale))
        scale = scale.at[n_in:].set(1.0)
        if live is not None:
            live = jnp.pad(live, (0, pad))
    n = xpos.shape[0]
    h, w = img.shape
    n_tiles = fused_tiles(h, w)
    if n_tiles is None:
        raise ValueError(f"image ({h}, {w}) too large for the fused kernel")

    # Refined keypoints can land (slightly) outside the image: the refine
    # Newton fallback pdx = dx/dxx is unbounded, matching the reference
    # (cudaSiftD.cu:1412-1417). Clamp the *sampling* coordinates into the
    # image box so (a) the untiled path's patch-origin dynamic slice stays
    # inside the padded VMEM image and (b) every keypoint routes to exactly
    # one y-tile — tiled and untiled paths then agree. Reported positions
    # (SiftData.xpos/ypos) are unaffected; only patch addressing clamps.
    xpos = jnp.clip(xpos, 0.0, float(w - 1))
    ypos = jnp.clip(ypos, 0.0, float(h - 1))

    if live is None:
        live = jnp.arange(n) < count
    step = -(-h // n_tiles)
    outs = None
    for t in range(n_tiles):
        y0 = t * step
        y1 = min(h, (t + 1) * step)
        y0e = max(y0 - _TILE_TOP, 0)
        img_t = jnp.pad(
            img[y0e : min(y1 + _TILE_BOT, h)],
            ((0, _PAD_R), (0, _PAD_C)), mode="edge",
        )
        live_t = live & (ypos >= y0) & (ypos < y1) if n_tiles > 1 else live
        res = _run_table(
            img_t, xpos, ypos - y0e, scale, live_t, interpret, mode
        )
        outs = res if outs is None else tuple(
            a + b for a, b in zip(outs, res))

    desc1, desc2, ori1, ori2, has2 = outs
    return (
        desc1[:n_in],
        desc2[:n_in],
        ori1[:n_in],
        ori2[:n_in],
        has2[:n_in] > 0.5,
    )
