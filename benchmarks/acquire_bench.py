"""Microbench: what does per-keypoint patch acquisition actually cost?

Separates the three candidate costs of getting a keypoint's image patch into
VMEM registers: (a) the HBM->VMEM async DMA, (b) the dynamic realignment
rolls, (c) a VMEM-resident image with dynamic slicing + rolls (no HBM DMA).
Decides the acquisition strategy for the batched keypoint kernels.
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

B = 8
PR = 56
PWR = 256
P = 48
PW = 64


def make_hbm_variant(do_roll):
    def kernel(oy_ref, ox_ref, rxy_ref, img_ref, out_ref, patch, sems):
        blk = pl.program_id(0)

        def copy(k):
            i = blk * B + k
            oy = pl.multiple_of(oy_ref[i], 8)
            ox = pl.multiple_of(ox_ref[i], 128)
            return pltpu.make_async_copy(
                img_ref.at[pl.ds(oy, PR), pl.ds(ox, PWR)],
                patch.at[k], sems.at[k])

        for k in range(B):
            copy(k).start()
        acc = jnp.zeros((1, 128), jnp.float32)
        for k in range(B):
            copy(k).wait()
            if do_roll:
                ry = rxy_ref[blk * B + k]
                rx = rxy_ref[blk * B + k + 65536]
                a = pltpu.roll(patch[k], (PR - ry) % PR, axis=0)[:P, :]
                a = pltpu.roll(a, (PWR - rx) % PWR, axis=1)[:, :PW]
            else:
                a = patch[k][:P, :PW]
            acc = acc + jnp.sum(a, axis=0, keepdims=True)[:, :PW].sum(
                axis=1, keepdims=True)
        out_ref[0, 0] = acc[0]

    @jax.jit
    def run(img, oy, ox, rxy):
        n = oy.shape[0]
        nb = n // B
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((B, PR, PWR), jnp.float32),
                pltpu.SemaphoreType.DMA((B,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
            grid_spec=grid_spec,
        )(oy, ox, rxy, img)

    return run


def make_vmem_variant(do_roll):
    def kernel(oy_ref, ox_ref, rxy_ref, img_ref, out_ref):
        blk = pl.program_id(0)
        acc = jnp.zeros((1, 128), jnp.float32)
        for k in range(B):
            i = blk * B + k
            oy = pl.multiple_of(oy_ref[i], 8)
            ox = pl.multiple_of(ox_ref[i], 128)
            raw = img_ref[pl.ds(oy, PR), pl.ds(ox, PWR)]
            if do_roll:
                ry = rxy_ref[i]
                rx = rxy_ref[i + 65536]
                a = pltpu.roll(raw, (PR - ry) % PR, axis=0)[:P, :]
                a = pltpu.roll(a, (PWR - rx) % PWR, axis=1)[:, :PW]
            else:
                a = raw[:P, :PW]
            acc = acc + jnp.sum(a, axis=0, keepdims=True)[:, :PW].sum(
                axis=1, keepdims=True)
        out_ref[0, 0] = acc[0]

    @jax.jit
    def run(img, oy, ox, rxy):
        n = oy.shape[0]
        nb = n // B
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0)),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=14 * 1024 * 1024,
            ),
        )(oy, ox, rxy, img)

    return run


def main():
    rng = np.random.default_rng(0)
    n = 2048
    img = jnp.asarray(make_test_image(1080 + PR, 1920 + PWR))
    h, w = img.shape
    ys = rng.integers(0, (h - PR) // 8, n) * 8
    xs = rng.integers(0, (w - PWR) // 128, n) * 128
    oy = jnp.asarray(ys.astype(np.int32))
    ox = jnp.asarray(xs.astype(np.int32))
    rxy = jnp.asarray(
        np.concatenate([
            rng.integers(0, 8, 65536), rng.integers(0, 128, 65536)
        ]).astype(np.int32))

    for name, maker, roll in (
        ("hbm dma, no roll ", make_hbm_variant, False),
        ("hbm dma + rolls  ", make_hbm_variant, True),
        ("vmem res, no roll", make_vmem_variant, False),
        ("vmem res + rolls ", make_vmem_variant, True),
    ):
        run = maker(roll)
        try:
            t = device_time(lambda p: run(img + p, oy, ox, rxy), chain=8)
            log(f"{name}: {t:.3f} ms  ({t/n*1e6:.0f} ns/kp)")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
