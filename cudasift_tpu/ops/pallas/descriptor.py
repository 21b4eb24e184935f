"""Pallas TPU descriptor kernel.

The CUDA kernel (ExtractSiftDescriptorsCONSTNew, cudaSiftD.cu:308-417) leans
on texture hardware (bilinear gathers) and shared-memory atomics — neither
exists on TPU. This kernel is the TPU-native shape of the same computation:

- one async DMA brings each keypoint's 48x128 image patch into VMEM
  (replacing ~1k scattered texture reads with one strided copy);
- bilinear sampling of all 1024 taps (256 grid samples x 4 rotated gradient
  taps) becomes ONE bf16 MXU contraction against a tent-weight column matrix
  plus a row-tent elementwise reduction. Patches are mean-centered before the
  bf16 cast: bilinear weights sum to 1, so the shift cancels exactly in the
  gradient differences and the cast error drops ~8x;
- the trilinear histogram scatter becomes two constant matmuls
  (sample-row/column weights) and an iota-built angular one-hot.

Grid: one program per block of B keypoints; patch DMAs for the whole block
are issued up front so copies overlap compute.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.jit import tpu_jit

B = 8          # keypoints per program
PR = 56        # DMA patch rows (48 needed + 8 for sublane-aligned origins)
PWR = 256      # DMA patch cols (span + 128 for lane-aligned origins)
P = 48         # compute patch rows (after in-kernel realignment roll)
PW = 128       # compute patch cols
S = 1024       # samples: 256 grid points x 4 taps
MARGIN = 22    # patch origin offset; covers octave scales up to ~2.4


# FastAtan2 polynomial (cudaSiftD.cu:295-306) — pure jnp, VPU-only, so the
# XLA implementation works unchanged inside Pallas kernels.
from ..texture import fast_atan2 as _fast_atan2


def _desc_kernel(oy_ref, ox_ref, cnt_ref, img_ref, kpf_ref, out_ref, patch, sems):
    blk = pl.program_id(0)
    total = cnt_ref[0]

    def copy(k):
        i = blk * B + k
        # Origins are pre-aligned (rows to 8, cols to 128) so the HBM slice
        # satisfies Mosaic's tiled-memref divisibility requirements.
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
    tap = lane // 256
    rem = lane - tap * 256
    gy = (rem // 16).astype(jnp.float32) - 7.5
    gx = (rem - (rem // 16) * 16).astype(jnp.float32) - 7.5
    psub = jax.lax.broadcasted_iota(jnp.int32, (P, S), 0).astype(jnp.float32)
    qsub = jax.lax.broadcasted_iota(jnp.int32, (PW, S), 0).astype(jnp.float32)
    lane256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    dsub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

    for k in range(B):
        live = blk * B + k < total

        @pl.when(jnp.logical_not(live))
        def _():
            out_ref[0, :, k] = jnp.zeros((128,), jnp.float32)

        @pl.when(live)
        def _():
            _desc_one(k, oy_ref, ox_ref, kpf_ref, out_ref, patch, sems, copy)


def _desc_one(k, oy_ref, ox_ref, kpf_ref, out_ref, patch, sems, copy):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    tap = lane // 256
    rem = lane - tap * 256
    gy = (rem // 16).astype(jnp.float32) - 7.5
    gx = (rem - (rem // 16) * 16).astype(jnp.float32) - 7.5
    psub = jax.lax.broadcasted_iota(jnp.int32, (P, S), 0).astype(jnp.float32)
    qsub = jax.lax.broadcasted_iota(jnp.int32, (PW, S), 0).astype(jnp.float32)
    lane256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
    dsub = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    if True:
        copy(k).wait()
        # Realign: roll away the DMA-alignment residuals so compute runs on
        # the minimal (48, 128) patch.
        ry = kpf_ref[0, k, 6].astype(jnp.int32)
        rx = kpf_ref[0, k, 7].astype(jnp.int32)
        a = pltpu.roll(patch[k], (PR - ry) % PR, axis=0)[:P, :]
        a = pltpu.roll(a, (PWR - rx) % PWR, axis=1)[:, :PW]
        lx0 = kpf_ref[0, k, 0]
        ly0 = kpf_ref[0, k, 1]
        scosa = kpf_ref[0, k, 2]
        ssina = kpf_ref[0, k, 3]
        cosa = kpf_ref[0, k, 4]
        sina = kpf_ref[0, k, 5]

        xs = lx0 + gx * scosa - gy * ssina + 0.5
        ys = ly0 + gx * ssina + gy * scosa + 0.5
        # Rotated unit gradient taps (cudaSiftD.cu:340-343), selected by tap id.
        tapx = jnp.where(
            tap == 0, cosa, jnp.where(tap == 1, -cosa, jnp.where(tap == 2, -sina, sina))
        )
        tapy = jnp.where(
            tap == 0, sina, jnp.where(tap == 1, -sina, jnp.where(tap == 2, cosa, -cosa))
        )
        sx = jnp.clip(xs + tapx - 0.5, 0.0, PW - 1.0)
        sy = jnp.clip(ys + tapy - 0.5, 0.0, P - 1.0)

        # Tent weights == bilinear with clamp folded in (coords pre-clipped).
        rows = jnp.maximum(0.0, 1.0 - jnp.abs(psub - sy))          # (P, S) f32
        cols = jnp.maximum(0.0, 1.0 - jnp.abs(qsub - sx)).astype(jnp.bfloat16)

        mean = jnp.mean(a)
        pc = (a - mean).astype(jnp.bfloat16)                       # (P, PW)
        # T[p, s] = sum_q patch[p, q] * cols[q, s]   (MXU, f32 accum)
        t = jax.lax.dot_general(
            pc, cols, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                           # (P, S)
        vals = jnp.sum(rows * t, axis=0, keepdims=True)            # (1, S)

        dx = vals[:, 0:256] - vals[:, 256:512]
        dy = vals[:, 512:768] - vals[:, 768:1024]
        grad = jnp.sqrt(dx * dx + dy * dy)
        # Gaussian sample weighting exp(-(d^2)/128) (cudaSiftD.cu:318,344).
        gxs = (lane256 % 16).astype(jnp.float32) - 7.5
        gys = (lane256 // 16).astype(jnp.float32) - 7.5
        grad = grad * jnp.exp(-(gxs * gxs + gys * gys) / 128.0)
        angf = 4.0 / 3.1415 * _fast_atan2(dy, dx) + 4.0
        angi_raw = jnp.floor(angf)
        frac = angf - angi_raw
        angi = (angi_raw.astype(jnp.int32) % 8).astype(jnp.float32)
        angp = jnp.where(angi == 7.0, 0.0, angi + 1.0)

        # Trilinear binning as a (128, 256) three-factor mask product:
        # descriptor index d = 32*row_cell + 8*col_cell + bin on sublanes,
        # samples on lanes. Row/col cell weights (cudaSiftD.cu:347-386) and
        # the angular pair become broadcast compares — no reshape, no
        # scatter, and the boundary gates are the cell-index range itself.
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
        # L2 -> clamp 0.2 -> L2 (cudaSiftD.cu:390-409).
        n1 = jax.lax.rsqrt(jnp.maximum(jnp.sum(desc * desc), 1e-30))
        t1n = jnp.minimum(desc * n1, 0.2)
        n2 = jax.lax.rsqrt(jnp.maximum(jnp.sum(t1n * t1n), 1e-30))
        out_ref[0, :, k] = (t1n * n2)[:, 0]


@tpu_jit(static_argnames=("interpret",))
def extract_descriptors_pallas(
    img: jnp.ndarray,
    xpos: jnp.ndarray,
    ypos: jnp.ndarray,
    scale: jnp.ndarray,
    orientation: jnp.ndarray,
    interpret: bool = False,
    count: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(N, 128) descriptors; Pallas twin of ops.descriptor.extract_descriptors.

    ``count``: number of live keypoints — programs covering only slots past
    it skip their DMAs and compute entirely (capacity padding is free).
    """
    n_in = xpos.shape[0]
    if count is None:
        count = jnp.int32(n_in)
    pad = (-n_in) % B
    if pad:
        xpos, ypos, scale, orientation = (
            jnp.pad(a, (0, pad)) for a in (xpos, ypos, scale, orientation)
        )
    n = xpos.shape[0]
    # Edge-pad bottom/right so an aligned origin never needs a ceiling
    # clamp (replicated rows/cols equal what clamp addressing reads anyway).
    img = jnp.pad(img, ((0, PR), (0, PWR)), mode="edge")
    h, w = img.shape

    o_y = jnp.maximum(jnp.floor(ypos).astype(jnp.int32) - MARGIN, 0)
    o_x = jnp.maximum(jnp.floor(xpos).astype(jnp.int32) - MARGIN, 0)
    oy = o_y // 8 * 8
    ox = o_x // 128 * 128

    theta = (2.0 * 3.1415 / 360.0) * orientation
    sina = jnp.sin(theta)
    cosa = jnp.cos(theta)
    s12 = (12.0 / 16.0) * scale
    kpf = jnp.stack(
        [
            xpos - o_x.astype(jnp.float32),
            ypos - o_y.astype(jnp.float32),
            s12 * cosa,
            s12 * sina,
            cosa,
            sina,
            (o_y - oy).astype(jnp.float32),
            (o_x - ox).astype(jnp.float32),
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
        out_specs=pl.BlockSpec((1, 128, B), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B, PR, PWR), jnp.float32),
            pltpu.SemaphoreType.DMA((B,)),
        ],
    )
    out = pl.pallas_call(
        _desc_kernel,
        out_shape=jax.ShapeDtypeStruct((nb, 128, B), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy, ox, jnp.atleast_1d(jnp.asarray(count, jnp.int32)), img, kpf)
    # (nb, 128, B) -> (N, 128): the kernel writes descriptors column-wise
    # (sublane-major) to avoid an in-kernel transpose.
    return out.transpose(0, 2, 1).reshape(n, 128)[:n_in]
