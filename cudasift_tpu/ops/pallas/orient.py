"""Pallas TPU orientation-histogram kernel.

TPU-native shape of ComputeOrientationsCONST's gather+atomic stage
(cudaSiftD.cu:972-1002). Key observation: unlike the descriptor's rotated
grid, the orientation window's texture taps are AXIS-ALIGNED with one shared
subpixel fraction per keypoint (xf = xpos - 4.5 + integer). So:

1. one DMA brings a 24x256 patch into VMEM (origins aligned for the tiled
   HBM memref);
2. the patch is bilinearly shifted ONCE by the keypoint's (fx, fy) fraction
   in f32 (four static-shift FMAs) — after that every tap is an integer
   pixel read;
3. the 13x13 integer value grid is selected by EXACT one-hot matmuls with
   the patch split into bf16 high+low halves — f32-accurate selection on the
   MXU, no gather;
4. gradients are lane-rolls of the value grid; the 32-bin histogram is a
   broadcast compare + lane reduction (no scatter, no transpose).

Peak finding stays in XLA (ops.orient.histogram_peaks).

Border note: within 7 px of the image edge the continuous clamp of tex2D is
approximated by clamping the integer tap index while keeping the subpixel
fraction; interior keypoints are exact.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.jit import tpu_jit

B = 8        # keypoints per program
PR = 24      # DMA patch rows (window span + 8 for sublane-aligned origins)
PWR = 256    # DMA patch cols (window span + 128 for lane-aligned origins)
P = 16       # compute patch rows (after in-kernel realignment roll)
PW = 128     # compute patch cols
S = 256      # 13x13 = 169 integer grid values, padded to 256 lanes
MARGIN = 7


def _atan2_poly(y, x):
    """Octant-reduced minimax atan2, |err| < 1e-6 rad — matches
    jnp.arctan2 to histogram-bin precision without a transcendental op."""
    absx = jnp.abs(x)
    absy = jnp.abs(y)
    mx = jnp.maximum(absx, absy)
    mn = jnp.minimum(absx, absy)
    z = mn / jnp.where(mx == 0.0, 1.0, mx)
    s = z * z
    # atan(z), z in [0, 1]; degree-15 odd polynomial.
    r = jnp.float32(-0.0040540580)
    for c in (0.0218612288, -0.0559098861, 0.0964200441, -0.1390853351,
              0.1994653599, -0.3332985605, 0.9999993329):
        r = r * s + jnp.float32(c)
    r = r * z
    r = jnp.where(absy > absx, 1.5707963268 - r, r)
    r = jnp.where(x < 0, 3.1415926536 - r, r)
    return jnp.where(y < 0, -r, r)


def _ori_kernel(oy_ref, ox_ref, cnt_ref, img_ref, kpf_ref, out_ref, patch, sems):
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

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    uy = lane // 13
    ux = lane - uy * 13
    psub = jax.lax.broadcasted_iota(jnp.int32, (P, S), 0)
    qsub = jax.lax.broadcasted_iota(jnp.int32, (PW, S), 0)
    csub = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0).astype(jnp.float32)
    # Window-point mask: (xd, yd) = (ux, uy) must lie in the 11x11 window.
    win_ok = ((ux <= 10) & (uy <= 10) & (lane < 169)).astype(jnp.float32)

    for k in range(B):
        live = blk * B + k < total

        @pl.when(jnp.logical_not(live))
        def _():
            out_ref[0, :, k] = jnp.zeros((32,), jnp.float32)

        @pl.when(live)
        def _():
            _ori_one(k, kpf_ref, out_ref, patch, copy)


def _ori_one(k, kpf_ref, out_ref, patch, copy):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    uy = lane // 13
    ux = lane - uy * 13
    psub = jax.lax.broadcasted_iota(jnp.int32, (P, S), 0)
    qsub = jax.lax.broadcasted_iota(jnp.int32, (PW, S), 0)
    csub = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0).astype(jnp.float32)
    win_ok = ((ux <= 10) & (uy <= 10) & (lane < 169)).astype(jnp.float32)
    if True:
        copy(k).wait()
        cbase = kpf_ref[0, k, 0].astype(jnp.int32)   # floor(x) - o_x - 6
        rbase = kpf_ref[0, k, 1].astype(jnp.int32)   # floor(y) - o_y - 6
        fx = kpf_ref[0, k, 2]
        fy = kpf_ref[0, k, 3]
        i2sigma2 = kpf_ref[0, k, 4]
        ry = kpf_ref[0, k, 5].astype(jnp.int32)
        rx = kpf_ref[0, k, 6].astype(jnp.int32)

        # Realign: roll away the DMA-alignment residuals, then one f32
        # bilinear shift of the patch by (fy, fx): afterwards every tex tap
        # is an integer read.
        a = pltpu.roll(patch[k], (PR - ry) % PR, axis=0)[:P, :]
        a = pltpu.roll(a, (PWR - rx) % PWR, axis=1)[:, :PW]
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
        onec = (qsub == col).astype(jnp.bfloat16)                 # (PW, S)
        oner = (psub == row).astype(jnp.float32)                  # (P, S)
        t = jax.lax.dot_general(
            hi, onec, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            lo, onec, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        v = jnp.sum(oner * t, axis=0, keepdims=True)              # (1, S)

        # Gradients at window point (xd, yd): dx = v(xd+2, yd+1)-v(xd, yd+1),
        # dy = v(xd+1, yd+2)-v(xd+1, yd): lane rolls of the 13-wide grid.
        dx = pltpu.roll(v, S - 15, axis=1) - pltpu.roll(v, S - 13, axis=1)
        dy = pltpu.roll(v, S - 27, axis=1) - pltpu.roll(v, S - 1, axis=1)
        theta = _atan2_poly(dy, dx)
        b = jnp.floor(16.0 * theta / 3.1416 + 16.5).astype(jnp.int32)
        b = jnp.where(b > 31, 0, b)
        g = jnp.exp(
            i2sigma2
            * (
                (ux.astype(jnp.float32) - 5.0) ** 2
                + (uy.astype(jnp.float32) - 5.0) ** 2
            )
        )
        w = jnp.sqrt(dx * dx + dy * dy) * g * win_ok

        onehot = (csub == b.astype(jnp.float32)).astype(jnp.float32)  # (32, S)
        hist = jnp.sum(w * onehot, axis=1, keepdims=True)             # (32, 1)
        out_ref[0, :, k] = hist[:, 0]


@tpu_jit(static_argnames=("interpret",))
def orientation_histograms_pallas(
    img: jnp.ndarray,
    xpos: jnp.ndarray,
    ypos: jnp.ndarray,
    scale: jnp.ndarray,
    interpret: bool = False,
    count: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(N, 32) histograms; Pallas twin of ops.orient.orientation_histograms.

    ``count``: number of live keypoints — programs past it skip entirely.
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
            fl_x - o_x.astype(jnp.float32) - 6.0,
            fl_y - o_y.astype(jnp.float32) - 6.0,
            xpos - fl_x,
            ypos - fl_y,
            i2sigma2,
            (o_y - oy).astype(jnp.float32),
            (o_x - ox).astype(jnp.float32),
            jnp.zeros_like(xpos),
        ],
        axis=-1,
    ).reshape(n // B, B, 8)

    nb = n // B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, B, 8), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 32, B), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B, PR, PWR), jnp.float32),
            pltpu.SemaphoreType.DMA((B,)),
        ],
    )
    out = pl.pallas_call(
        _ori_kernel,
        out_shape=jax.ShapeDtypeStruct((nb, 32, B), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy, ox, jnp.atleast_1d(jnp.asarray(count, jnp.int32)), img, kpf)
    return out.transpose(0, 2, 1).reshape(n, 32)[:n_in]
