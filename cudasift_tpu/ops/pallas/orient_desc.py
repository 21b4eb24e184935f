"""Fused orientation + descriptor Pallas kernel.

TPU-native equivalent of the reference's wired-but-disabled
``OrientAndExtractCONST`` (cudaSiftD.cu:1060-1150, launch cudaSiftH.cu:384-395):
orientation assignment and descriptor extraction in ONE kernel, handling the
second-peak duplicate inline. Compared to the separate kernels
(``ops/pallas/orient.py`` + ``ops/pallas/descriptor.py``) this

- shares one patch DMA and one realignment per keypoint between both stages
  (the orientation window is a sub-rectangle of the descriptor patch);
- runs histogram smoothing + peak finding in-kernel (32-bin VPU work), so the
  pipeline needs no intermediate XLA peak pass and **no per-octave
  second-peak compaction** — the duplicate descriptor is produced in place,
  gated by ``@pl.when`` so it costs nothing when there is no second peak;
- shrinks the descriptor compute patch from (48, 128) to (48, 64): all
  sample taps live within +-17.5 px of the keypoint (max octave scale < 2.0,
  spacing 12/16*scale, cudaSiftD.cu:333-335), and the per-keypoint tent
  matrices — the VPU-dominant cost — halve with the patch width.

Arithmetic is identical to the two split kernels (which stay as the
independently-tested building blocks): exact hi/lo-split one-hot selection
for the orientation grid, octant-reduced atan2, bf16 mean-centered tent
sampling for descriptors, trilinear binning as broadcast compares.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .orient import _atan2_poly
from .descriptor import _fast_atan2

B = 8        # keypoints per program
PR = 56      # DMA patch rows (48 needed + 8 for sublane-aligned origins)
PWR = 256    # DMA patch cols (span + 128 for lane-aligned origins)
P = 48       # compute patch rows (after realignment roll)
PW = 64      # compute patch cols (samples span < +-18 px around col ~22)
S = 1024     # descriptor samples: 256 grid points x 4 taps
SO = 256     # orientation lanes: 13x13 = 169 grid values, padded
MARGIN = 22  # patch origin offset; covers octave scales < 2.4


def _sel32(onehot_src, idx, vals):
    """vals[idx] for a (32, 1) column via compare+sum (no dynamic index)."""
    return jnp.sum(jnp.where(onehot_src == idx, vals, 0.0))


def _orient_one(a, kpf_ref, k):
    """Histogram + smoothed peak finding for keypoint ``k``.

    ``a``: realigned (P, PW) f32 patch. Returns (ori1_deg, ori2_deg, has2)
    scalars. Matches ops.orient.orientation_histograms + histogram_peaks
    (cudaSiftD.cu:972-1057) bin for bin.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SO), 1)
    uy = lane // 13
    ux = lane - uy * 13
    psub = jax.lax.broadcasted_iota(jnp.int32, (P, SO), 0)
    qsub = jax.lax.broadcasted_iota(jnp.int32, (PW, SO), 0)
    csub = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0).astype(jnp.float32)
    win_ok = ((ux <= 10) & (uy <= 10) & (lane < 169)).astype(jnp.float32)

    cbase = kpf_ref[0, k, 8].astype(jnp.int32)   # floor(x) - o_x - 6
    rbase = kpf_ref[0, k, 9].astype(jnp.int32)   # floor(y) - o_y - 6
    fx = kpf_ref[0, k, 2]
    fy = kpf_ref[0, k, 3]
    i2sigma2 = kpf_ref[0, k, 4]

    # One f32 bilinear shift of the patch by (fy, fx): afterwards every
    # orientation tap is an integer-grid read (exact tex2D semantics for
    # interior keypoints; border taps clamp the integer index).
    a_x = pltpu.roll(a, PW - 1, axis=1)
    a_y = pltpu.roll(a, P - 1, axis=0)
    a_xy = pltpu.roll(a_x, P - 1, axis=0)
    pi = (1.0 - fy) * ((1.0 - fx) * a + fx * a_x) + fy * (
        (1.0 - fx) * a_y + fx * a_xy
    )
    hi = pi.astype(jnp.bfloat16)
    lo = (pi - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    col = jnp.clip(cbase + ux, 0, PW - 1)
    row = jnp.clip(rbase + uy, 0, P - 1)
    onec = (qsub == col).astype(jnp.bfloat16)                 # (PW, SO)
    oner = (psub == row).astype(jnp.float32)                  # (P, SO)
    t = jax.lax.dot_general(
        hi, onec, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        lo, onec, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    v = jnp.sum(oner * t, axis=0, keepdims=True)              # (1, SO)

    # Gradients at window (xd, yd): lane rolls of the 13-wide grid.
    dx = pltpu.roll(v, SO - 15, axis=1) - pltpu.roll(v, SO - 13, axis=1)
    dy = pltpu.roll(v, SO - 27, axis=1) - pltpu.roll(v, SO - 1, axis=1)
    theta = _atan2_poly(dy, dx)
    b = jnp.floor(16.0 * theta / 3.1416 + 16.5).astype(jnp.int32)
    b = jnp.where(b > 31, 0, b)
    g = jnp.exp(
        i2sigma2
        * ((ux.astype(jnp.float32) - 5.0) ** 2 + (uy.astype(jnp.float32) - 5.0) ** 2)
    )
    w = jnp.sqrt(dx * dx + dy * dy) * g * win_ok

    onehot = (csub == b.astype(jnp.float32)).astype(jnp.float32)  # (32, SO)
    hist = jnp.sum(w * onehot, axis=1, keepdims=True)             # (32, 1)

    # Smooth [1,4,6,4,1] circular + peak finding (cudaSiftD.cu:1009-1037),
    # replicating ops.orient.histogram_peaks on a (32, 1) column.
    sm = (
        6.0 * hist
        + 4.0 * (pltpu.roll(hist, 1, axis=0) + pltpu.roll(hist, 31, axis=0))
        + pltpu.roll(hist, 2, axis=0)
        + pltpu.roll(hist, 30, axis=0)
    )
    left = pltpu.roll(sm, 1, axis=0)
    right = pltpu.roll(sm, 31, axis=0)
    peaks = jnp.where((sm > left) & (sm >= right), sm, 0.0)
    max1 = jnp.max(peaks)
    i1 = jnp.min(jnp.where(peaks == max1, csub, 32.0))
    masked = jnp.where(csub == i1, -jnp.inf, peaks)
    max2 = jnp.max(masked)
    i2 = jnp.min(jnp.where(masked == max2, csub, 32.0))

    def interp(i, m):
        ip = jnp.where(i >= 31.0, i - 31.0, i + 1.0)
        im = jnp.where(i < 1.0, i + 31.0, i - 1.0)
        v1 = _sel32(csub, ip, sm)
        v2 = _sel32(csub, im, sm)
        denom = 2.0 * m - v1 - v2
        peak = i + 0.5 * (v1 - v2) / jnp.where(denom == 0.0, 1e-30, denom)
        return 11.25 * jnp.where(peak < 0.0, peak + 32.0, peak)

    return interp(i1, max1), interp(i2, max2), max2 > 0.8 * max1


def _descriptor_one(a, kpf_ref, k, ori_deg, out_ref):
    """Descriptor for keypoint ``k`` at orientation ``ori_deg`` (degrees),
    written to ``out_ref[0, :, k]``. Matches ops.pallas.descriptor._desc_one
    on the narrowed (P, PW) patch."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    tap = lane // 256
    rem = lane - tap * 256
    gy = (rem // 16).astype(jnp.float32) - 7.5
    gx = (rem - (rem // 16) * 16).astype(jnp.float32) - 7.5
    psub = jax.lax.broadcasted_iota(jnp.int32, (P, S), 0).astype(jnp.float32)
    qsub = jax.lax.broadcasted_iota(jnp.int32, (PW, S), 0).astype(jnp.float32)
    lane256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    dsub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

    lx0 = kpf_ref[0, k, 0]
    ly0 = kpf_ref[0, k, 1]
    s12 = kpf_ref[0, k, 7]
    theta = jnp.float32(2.0 * 3.1415 / 360.0) * ori_deg
    cosa = jnp.cos(theta)
    sina = jnp.sin(theta)
    scosa = s12 * cosa
    ssina = s12 * sina

    xs = lx0 + gx * scosa - gy * ssina + 0.5
    ys = ly0 + gx * ssina + gy * scosa + 0.5
    tapx = jnp.where(
        tap == 0, cosa, jnp.where(tap == 1, -cosa, jnp.where(tap == 2, -sina, sina))
    )
    tapy = jnp.where(
        tap == 0, sina, jnp.where(tap == 1, -sina, jnp.where(tap == 2, cosa, -cosa))
    )
    sx = jnp.clip(xs + tapx - 0.5, 0.0, PW - 1.0)
    sy = jnp.clip(ys + tapy - 0.5, 0.0, P - 1.0)

    rows = jnp.maximum(0.0, 1.0 - jnp.abs(psub - sy))          # (P, S) f32
    cols = jnp.maximum(0.0, 1.0 - jnp.abs(qsub - sx)).astype(jnp.bfloat16)

    mean = jnp.mean(a)
    pc = (a - mean).astype(jnp.bfloat16)                       # (P, PW)
    t = jax.lax.dot_general(
        pc, cols, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                           # (P, S)
    vals = jnp.sum(rows * t, axis=0, keepdims=True)            # (1, S)

    dx = vals[:, 0:256] - vals[:, 256:512]
    dy = vals[:, 512:768] - vals[:, 768:1024]
    grad = jnp.sqrt(dx * dx + dy * dy)
    gxs = (lane256 % 16).astype(jnp.float32) - 7.5
    gys = (lane256 // 16).astype(jnp.float32) - 7.5
    grad = grad * jnp.exp(-(gxs * gxs + gys * gys) / 128.0)
    angf = 4.0 / 3.1415 * _fast_atan2(dy, dx) + 4.0
    angi_raw = jnp.floor(angf)
    frac = angf - angi_raw
    angi = (angi_raw.astype(jnp.int32) % 8).astype(jnp.float32)
    angp = jnp.where(angi == 7.0, 0.0, angi + 1.0)

    cy = jnp.floor((gys + 7.5 + 2.0) / 4.0) - 1.0              # (1, 256)
    fy = (gys + 7.5 - 1.5) / 4.0 - cy
    cx = jnp.floor((gxs + 7.5 + 2.0) / 4.0) - 1.0
    fx = (gxs + 7.5 - 1.5) / 4.0 - cx
    rbin = (dsub // 32).astype(jnp.float32)                    # (128, 1)
    cbin = ((dsub // 8) % 4).astype(jnp.float32)
    abin = (dsub % 8).astype(jnp.float32)
    wr = (cy == rbin) * (1.0 - fy) + (cy + 1.0 == rbin) * fy   # (128, 256)
    wc = (cx == cbin) * (1.0 - fx) + (cx + 1.0 == cbin) * fx
    wa = (angi == abin) * (1.0 - frac) + (angp == abin) * frac
    desc = jnp.sum(grad * wr * wc * wa, axis=1, keepdims=True)  # (128, 1)
    n1 = jax.lax.rsqrt(jnp.maximum(jnp.sum(desc * desc), 1e-30))
    t1n = jnp.minimum(desc * n1, 0.2)
    n2 = jax.lax.rsqrt(jnp.maximum(jnp.sum(t1n * t1n), 1e-30))
    out_ref[0, :, k] = (t1n * n2)[:, 0]


def _fused_kernel(
    oy_ref, ox_ref, cnt_ref, img_ref, kpf_ref,
    desc1_ref, desc2_ref, meta_ref, patch, sems,
):
    blk = pl.program_id(0)
    total = cnt_ref[0]

    def copy(k):
        i = blk * B + k
        oy = pl.multiple_of(oy_ref[i], 8)
        ox = pl.multiple_of(ox_ref[i], 128)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(oy, PR), pl.ds(ox, PWR)],
            patch.at[k],
            sems.at[k],
        )

    for k in range(B):
        @pl.when(blk * B + k < total)
        def _():
            copy(k).start()

    for k in range(B):
        live = blk * B + k < total

        @pl.when(jnp.logical_not(live))
        def _():
            zero = jnp.zeros((128,), jnp.float32)
            desc1_ref[0, :, k] = zero
            desc2_ref[0, :, k] = zero
            meta_ref[0, :, k] = jnp.zeros((8,), jnp.float32)

        @pl.when(live)
        def _():
            copy(k).wait()
            ry = kpf_ref[0, k, 5].astype(jnp.int32)
            rx = kpf_ref[0, k, 6].astype(jnp.int32)
            a = pltpu.roll(patch[k], (PR - ry) % PR, axis=0)[:P, :]
            a = pltpu.roll(a, (PWR - rx) % PWR, axis=1)[:, :PW]

            ori1, ori2, has2 = _orient_one(a, kpf_ref, k)
            meta_ref[0, :, k] = jnp.stack(
                [ori1, ori2, has2.astype(jnp.float32),
                 jnp.float32(0), jnp.float32(0), jnp.float32(0),
                 jnp.float32(0), jnp.float32(0)]
            )
            _descriptor_one(a, kpf_ref, k, ori1, desc1_ref)

            @pl.when(has2)
            def _():
                _descriptor_one(a, kpf_ref, k, ori2, desc2_ref)

            @pl.when(jnp.logical_not(has2))
            def _():
                desc2_ref[0, :, k] = jnp.zeros((128,), jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def orient_and_describe_pallas(
    img: jnp.ndarray,
    xpos: jnp.ndarray,
    ypos: jnp.ndarray,
    scale: jnp.ndarray,
    interpret: bool = False,
    count: jnp.ndarray | None = None,
):
    """Fused orientation + descriptors for ``count`` live keypoints.

    Returns (desc1 (N, 128), desc2 (N, 128), ori1 (N,), ori2 (N,),
    has2 (N,) bool). ``desc2``/``ori2`` are the second-peak duplicates,
    valid where ``has2``.
    """
    n_in = xpos.shape[0]
    if count is None:
        count = jnp.int32(n_in)
    pad = (-n_in) % B
    if pad:
        xpos, ypos, scale = (jnp.pad(a, (0, pad)) for a in (xpos, ypos, scale))
        scale = scale.at[n_in:].set(1.0)
    n = xpos.shape[0]
    img = jnp.pad(img, ((0, PR), (0, PWR)), mode="edge")

    fl_x = jnp.floor(xpos)
    fl_y = jnp.floor(ypos)
    o_y = jnp.maximum(fl_y.astype(jnp.int32) - MARGIN, 0)
    o_x = jnp.maximum(fl_x.astype(jnp.int32) - MARGIN, 0)
    oy = o_y // 8 * 8
    ox = o_x // 128 * 128
    i2sigma2 = -1.0 / (2.0 * 1.5 * 1.5 * scale * scale)
    kpf = jnp.stack(
        [
            xpos - o_x.astype(jnp.float32),            # 0: lx0
            ypos - o_y.astype(jnp.float32),            # 1: ly0
            xpos - fl_x,                               # 2: fx
            ypos - fl_y,                               # 3: fy
            i2sigma2,                                  # 4
            (o_y - oy).astype(jnp.float32),            # 5: ry residual
            (o_x - ox).astype(jnp.float32),            # 6: rx residual
            (12.0 / 16.0) * scale,                     # 7: s12
            fl_x - o_x.astype(jnp.float32) - 6.0,      # 8: cbase
            fl_y - o_y.astype(jnp.float32) - 6.0,      # 9: rbase
            jnp.zeros_like(xpos), jnp.zeros_like(xpos),
            jnp.zeros_like(xpos), jnp.zeros_like(xpos),
            jnp.zeros_like(xpos), jnp.zeros_like(xpos),
        ],
        axis=-1,
    ).reshape(n // B, B, 16)

    nb = n // B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, B, 16), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 128, B), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 128, B), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 8, B), lambda i, *_: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, PR, PWR), jnp.float32),
            pltpu.SemaphoreType.DMA((B,)),
        ],
    )
    desc1, desc2, meta = pl.pallas_call(
        _fused_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nb, 128, B), jnp.float32),
            jax.ShapeDtypeStruct((nb, 128, B), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy, ox, jnp.atleast_1d(jnp.asarray(count, jnp.int32)), img, kpf)
    desc1 = desc1.transpose(0, 2, 1).reshape(n, 128)[:n_in]
    desc2 = desc2.transpose(0, 2, 1).reshape(n, 128)[:n_in]
    meta = meta.transpose(0, 2, 1).reshape(n, 8)[:n_in]
    return desc1, desc2, meta[:, 0], meta[:, 1], meta[:, 2] > 0.5
