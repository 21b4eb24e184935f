"""Capability probes for the batched keypoint-kernel redesign.

Each probe compiles + runs a minimal Pallas TPU kernel exercising one Mosaic
feature the v2 fused orient+descriptor kernel needs. Run on TPU; failures
print the error so the design can route around them.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"PASS {name}: {out if np.ndim(out) == 0 else np.asarray(out).ravel()[:4]}")
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")


def unaligned_sublane_slice():
    # VMEM-resident input, dynamic sublane offset NOT 8-aligned.
    def kernel(off_ref, img_ref, out_ref):
        o = off_ref[0]
        out_ref[...] = img_ref[pl.ds(o, 8), :]

    img = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, *_: (0, 0)),
        ),
    )(jnp.asarray([3], jnp.int32), img)
    expect = np.asarray(img)[3:11]
    assert np.array_equal(np.asarray(out), expect), "WRONG RESULT"
    return out[0, :2]


def lane_lane_dot():
    # dot_general contracting lane dims of both operands (implicit RHS^T).
    def kernel(a_ref, b_ref, out_ref):
        out_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    a = jnp.asarray(np.random.default_rng(0).normal(size=(16, 256)), jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(16, 256)), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 16), jnp.float32),
    )(a, b)
    ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32).T
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 0.1, f"WRONG {err}"
    return jnp.float32(err)


def f32_scalar_prefetch():
    def kernel(s_ref, x_ref, out_ref):
        out_ref[...] = x_ref[...] * s_ref[2]

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda i, *_: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i, *_: (0, 0)),
        ),
    )(jnp.asarray([1.0, 2.0, 3.5], jnp.float32), x)
    assert float(out[0, 0]) == 3.5
    return out[0, :1]


def transpose_2d():
    def kernel(x_ref, out_ref):
        out_ref[...] = x_ref[...].T

    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 256)), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 16), jnp.float32),
    )(x)
    assert np.array_equal(np.asarray(out), np.asarray(x).T)
    return out[0, :2]


def concat_blockdiag():
    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[...]
        b = b_ref[...]
        z = jnp.zeros((48, 64), jnp.float32)
        top = jnp.concatenate([a, z], axis=1)
        bot = jnp.concatenate([z, b], axis=1)
        out_ref[...] = jnp.concatenate([top, bot], axis=0)

    a = jnp.ones((48, 64), jnp.float32)
    b = jnp.full((48, 64), 2.0, jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((96, 128), jnp.float32),
    )(a, b)
    o = np.asarray(out)
    assert o[0, 0] == 1 and o[50, 70] == 2 and o[0, 70] == 0 and o[50, 0] == 0
    return out[0, :1]


def sublane_interleave_write():
    # Write (16, B) into rows [a::8] of a (128, B) scratch via strided store?
    def kernel(x_ref, out_ref):
        out_ref[...] = jnp.zeros((128, 128), jnp.float32)
        out_ref[3::8, :] = x_ref[...]

    x = jnp.ones((16, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )(x)
    o = np.asarray(out)
    assert o[3, 0] == 1 and o[11, 0] == 1 and o[4, 0] == 0
    return out[3, :1]


def dyn_roll_cost_shape():
    # roll with dynamic shift on (48, 256).
    def kernel(s_ref, x_ref, out_ref):
        out_ref[...] = pltpu.roll(x_ref[...], s_ref[0], axis=1)

    x = jnp.asarray(np.arange(48 * 256).reshape(48, 256), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((48, 256), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((48, 256), lambda i, *_: (0, 0))],
            out_specs=pl.BlockSpec((48, 256), lambda i, *_: (0, 0)),
        ),
    )(jnp.asarray([5], jnp.int32), x)
    expect = np.roll(np.asarray(x), 5, axis=1)
    assert np.array_equal(np.asarray(out), expect)
    return out[0, :1]


def f32_small_dot():
    # f32 matmul (16,256)x(256,128) — allowed? cost irrelevant here.
    def kernel(a_ref, b_ref, out_ref):
        out_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                               preferred_element_type=jnp.float32)

    a = jnp.asarray(np.random.default_rng(0).normal(size=(16, 256)), jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(256, 128)), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(a, b)
    err = np.abs(np.asarray(out) - np.asarray(a) @ np.asarray(b)).max()
    return jnp.float32(err)


if __name__ == "__main__":
    probe("unaligned_sublane_slice", unaligned_sublane_slice)
    probe("lane_lane_dot", lane_lane_dot)
    probe("f32_scalar_prefetch", f32_scalar_prefetch)
    probe("transpose_2d", transpose_2d)
    probe("concat_blockdiag", concat_blockdiag)
    probe("sublane_interleave_write", sublane_interleave_write)
    probe("dyn_roll_cost_shape", dyn_roll_cost_shape)
    probe("f32_small_dot", f32_small_dot)
