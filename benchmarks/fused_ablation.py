"""TPU ablation of the fused orient+descriptor kernel vs the split kernels.

Times kernel variants on N synthetic keypoints to attribute per-keypoint
cost: DMA+roll, orientation, peaks, descriptor, second descriptor.
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import device_time, make_test_image, log
from cudasift_tpu.ops.pallas import orient_desc as od
from cudasift_tpu.ops.pallas.orient import orientation_histograms_pallas
from cudasift_tpu.ops.pallas.descriptor import extract_descriptors_pallas

B, PR, PWR, P, PW = od.B, od.PR, od.PWR, od.P, od.PW


def make_variant(mode):
    """mode: 'full', 'no2nd', 'orient_only', 'desc_only', 'dma_only'."""

    def kernel(oy_ref, ox_ref, cnt_ref, img_ref, kpf_ref,
               desc1_ref, desc2_ref, meta_ref, patch, sems):
        blk = pl.program_id(0)
        total = cnt_ref[0]

        def copy(k):
            i = blk * B + k
            oy = pl.multiple_of(oy_ref[i], 8)
            ox = pl.multiple_of(ox_ref[i], 128)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(oy, PR), pl.ds(ox, PWR)],
                patch.at[k], sems.at[k])

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

                if mode == "dma_only":
                    desc1_ref[0, :, k] = jnp.pad(
                        jnp.sum(a, axis=1), (0, 128 - P))
                    desc2_ref[0, :, k] = jnp.zeros((128,), jnp.float32)
                    meta_ref[0, :, k] = jnp.zeros((8,), jnp.float32)
                    return

                if mode in ("full", "no2nd", "orient_only"):
                    ori1, ori2, has2 = od._orient_one(a, kpf_ref, k)
                else:
                    ori1 = kpf_ref[0, k, 10]
                    ori2 = ori1
                    has2 = jnp.bool_(False)
                meta_ref[0, :, k] = jnp.stack(
                    [ori1, ori2, has2.astype(jnp.float32)] +
                    [jnp.float32(0)] * 5)
                if mode == "orient_only":
                    desc1_ref[0, :, k] = jnp.zeros((128,), jnp.float32)
                    desc2_ref[0, :, k] = jnp.zeros((128,), jnp.float32)
                    return
                od._descriptor_one(a, kpf_ref, k, ori1, desc1_ref)
                if mode == "full":
                    @pl.when(has2)
                    def _():
                        od._descriptor_one(a, kpf_ref, k, ori2, desc2_ref)

                    @pl.when(jnp.logical_not(has2))
                    def _():
                        desc2_ref[0, :, k] = jnp.zeros((128,), jnp.float32)
                else:
                    desc2_ref[0, :, k] = jnp.zeros((128,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=())
    def run(img, xpos, ypos, scale, count):
        n = xpos.shape[0]
        img = jnp.pad(img, ((0, PR), (0, PWR)), mode="edge")
        fl_x = jnp.floor(xpos)
        fl_y = jnp.floor(ypos)
        o_y = jnp.maximum(fl_y.astype(jnp.int32) - od.MARGIN, 0)
        o_x = jnp.maximum(fl_x.astype(jnp.int32) - od.MARGIN, 0)
        oy = o_y // 8 * 8
        ox = o_x // 128 * 128
        i2sigma2 = -1.0 / (2.0 * 1.5 * 1.5 * scale * scale)
        kpf = jnp.stack(
            [xpos - o_x.astype(jnp.float32),
             ypos - o_y.astype(jnp.float32),
             xpos - fl_x, ypos - fl_y, i2sigma2,
             (o_y - oy).astype(jnp.float32),
             (o_x - ox).astype(jnp.float32),
             (12.0 / 16.0) * scale,
             fl_x - o_x.astype(jnp.float32) - 6.0,
             fl_y - o_y.astype(jnp.float32) - 6.0,
             jnp.full_like(xpos, 45.0)] + [jnp.zeros_like(xpos)] * 5,
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
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((nb, 128, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, 128, B), jnp.float32),
                jax.ShapeDtypeStruct((nb, 8, B), jnp.float32),
            ),
            grid_spec=grid_spec,
        )(oy, ox, jnp.atleast_1d(count), img, kpf)

    return run


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(make_test_image(1080, 1920))
    n = 2048
    x = jnp.asarray(rng.uniform(30, 1890, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(30, 1050, n).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.95, 1.9, n).astype(np.float32))
    cnt = jnp.int32(n)

    t = device_time(
        lambda p: orientation_histograms_pallas(img + p, x, y, s, count=cnt),
        chain=8)
    log(f"split orient:      {t:.3f} ms  ({t/n*1e3:.0f} ns/kp)")
    t = device_time(
        lambda p: extract_descriptors_pallas(
            img + p, x, y, s, jnp.full((n,), 45.0), count=cnt), chain=8)
    log(f"split desc:        {t:.3f} ms  ({t/n*1e3:.0f} ns/kp)")

    for mode in ("dma_only", "orient_only", "desc_only", "no2nd", "full"):
        run = make_variant(mode)
        t = device_time(lambda p: run(img + p, x, y, s, cnt), chain=8)
        log(f"fused {mode:12s} {t:.3f} ms  ({t/n*1e3:.0f} ns/kp)")


if __name__ == "__main__":
    main()
