"""Pallas TPU brute-force matcher: tiled matmul with fused online top-2.

The TPU-native reimagining of FindMaxCorr10 (matching.cu:301-397). The CUDA
kernel streams 32-wide descriptor tiles through shared memory with register
tiling and a running top-2; here each grid step computes one
(T1, T2) = d1_tile @ d2_tile^T MXU product and merges a per-row running
(best, second, index) triple held in the revisited output block — the score
matrix never touches HBM, preserving the reference's O(N) memory property
(README.md:49) with none of its spinlock merging (matching.cu:409).

Tie-breaking: lowest index wins, matching jnp.argmax in the XLA twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.jit import tpu_jit

T1 = 256   # query rows per block
T2 = 2048  # database rows per block


def _match_kernel(n2_ref, d1_ref, d2_ref, out_ref, use_bf16: bool):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    n2 = n2_ref[0]

    a = d1_ref[:, :]
    b = d2_ref[:, :]
    # Precision note (measured, round 2): a three-product bf16 split
    # (drop only lo*lo) reaches 2.2e-6 score error vs float64 and EXACT
    # f64 index agreement on random 16k sets at half the passes of
    # HIGHEST (2.80 -> 1.80 ms) — but on the bundled repetitive-texture
    # pair those last f32 bits carry real signal: near-tie matches flip
    # and the end-to-end consensus drops (nm 990 -> 858, numFit 806 ->
    # 557 at thresh 4.0). Match quality is the headline feature, so the
    # exact path stays on HIGHEST; `use_bf16` remains the speed tier.
    if use_bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=None if use_bf16 else jax.lax.Precision.HIGHEST,
    )  # (T1, T2)

    neg = jnp.float32(-1e30)
    big = jnp.int32(2**30)
    col = jax.lax.broadcasted_iota(jnp.int32, (T1, T2), 1) + j * T2
    scores = jnp.where(col < n2, scores, neg)
    t_best = jnp.max(scores, axis=1, keepdims=True)                   # (T1, 1)
    t_arg = jnp.min(
        jnp.where(scores == t_best, col, big), axis=1, keepdims=True
    )
    t_second = jnp.max(
        jnp.where(col == t_arg, neg, scores), axis=1, keepdims=True
    )
    t_argf = t_arg.astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:, 0:1] = t_best
        out_ref[:, 1:2] = t_second
        out_ref[:, 2:3] = t_argf

    @pl.when(j > 0)
    def _():
        best = out_ref[:, 0:1]
        second = out_ref[:, 1:2]
        idx = out_ref[:, 2:3]
        new_best = jnp.maximum(best, t_best)
        new_idx = jnp.where(t_best > best, t_argf, idx)
        new_second = jnp.maximum(jnp.minimum(best, t_best),
                                 jnp.maximum(second, t_second))
        out_ref[:, 0:1] = new_best
        out_ref[:, 1:2] = new_second
        out_ref[:, 2:3] = new_idx


@tpu_jit(static_argnames=("use_bf16", "interpret"))
def match_descriptors_pallas(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    n1: jnp.ndarray,
    n2: jnp.ndarray,
    use_bf16: bool = False,
    interpret: bool = False,
):
    """(score, ambiguity, index) per d1 row; Pallas twin of
    ops.match.match_descriptors."""
    n1_cap = d1.shape[0]
    pad1 = (-n1_cap) % T1
    if pad1:
        d1 = jnp.pad(d1, ((0, pad1), (0, 0)))
    pad2 = (-d2.shape[0]) % T2
    if pad2:
        d2 = jnp.pad(d2, ((0, pad2), (0, 0)))
    nb1 = d1.shape[0] // T1
    nb2 = d2.shape[0] // T2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb1, nb2),
        in_specs=[
            pl.BlockSpec((T1, 128), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((T2, 128), lambda i, j, *_: (j, 0)),
        ],
        out_specs=pl.BlockSpec((T1, 8), lambda i, j, *_: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_match_kernel, use_bf16=use_bf16),
        out_shape=jax.ShapeDtypeStruct((nb1 * T1, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.atleast_1d(jnp.asarray(n2, jnp.int32)), d1, d2)

    out = out[:n1_cap]
    best = jnp.maximum(out[:, 0], 0.0)
    second = jnp.maximum(out[:, 1], 0.0)
    index = jnp.maximum(out[:, 2].astype(jnp.int32), 0)
    ambiguity = second / (best + 1e-6)
    return best, ambiguity, index
