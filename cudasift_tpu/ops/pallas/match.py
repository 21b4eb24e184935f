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
CHUNK = 256   # lane chunk for the hybrid sweep's per-chunk top-2
NCAND = 2 * (T2 // CHUNK)  # candidates kept per (row, d2-tile): 16


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


def _sweep_kernel(n2_ref, d1_ref, d2_ref, out_ref):
    """Candidate sweep of the hybrid exact matcher.

    One (T1, T2) = d1_tile @ d2_tile^T product in a three-product bfloat16
    split (hi*hi + hi*lo + lo*hi; the dropped lo*lo term is below f32
    rounding at descriptor scale — measured 2.2e-6 max score error vs
    float64, half the MXU passes of Precision.HIGHEST). The tile is then
    scanned per 256-lane chunk for its top-2 (score, index) pairs, so every
    near-tie cluster — which on repetitive scenes sits at ADJACENT d2
    indices, i.e. inside one chunk — contributes at least its two best
    members to the exact rescore stage. No cross-tile merging: each grid
    step owns its own (T1, 2*NCAND) output slice.
    """
    j = pl.program_id(1)
    n2 = n2_ref[0]

    a = d1_ref[:, :]
    b = d2_ref[:, :]
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (1,)), ((), ()))
    f32 = jnp.float32
    scores = jax.lax.dot_general(a_hi, b_hi, dims, preferred_element_type=f32)
    scores = scores + (
        jax.lax.dot_general(a_hi, b_lo, dims, preferred_element_type=f32)
        + jax.lax.dot_general(a_lo, b_hi, dims, preferred_element_type=f32)
    )  # (T1, T2)

    neg = jnp.float32(-1e30)
    big = jnp.int32(2**30)
    col = jax.lax.broadcasted_iota(jnp.int32, (T1, T2), 1) + j * T2
    scores = jnp.where(col < n2, scores, neg)

    nch = T2 // CHUNK
    s_cols, i_cols = [], []
    for c in range(nch):
        s = scores[:, c * CHUNK:(c + 1) * CHUNK]
        # Per-chunk iota built locally: SLICING the (T1, T2) iota crashes
        # this Mosaic's lowering ("limits[i] <= dim(i)" in array.h).
        cc = jax.lax.broadcasted_iota(jnp.int32, (T1, CHUNK), 1) + (
            c * CHUNK + j * T2
        )
        b1 = jnp.max(s, axis=1, keepdims=True)
        i1 = jnp.min(jnp.where(s == b1, cc, big), axis=1, keepdims=True)
        s2 = jnp.where(cc == i1, neg, s)
        b2 = jnp.max(s2, axis=1, keepdims=True)
        i2 = jnp.min(jnp.where(s2 == b2, cc, big), axis=1, keepdims=True)
        s_cols += [b1, b2]
        i_cols += [i1.astype(f32), i2.astype(f32)]
    # Scatter the 32 live columns into the 128-lane block with a
    # broadcast-select chain (Mosaic rejects lane-concat of width-1 slices).
    lane = jax.lax.broadcasted_iota(jnp.int32, (T1, 128), 1)
    block = jnp.zeros((T1, 128), f32)
    for k, v in enumerate(s_cols + i_cols):
        block = jnp.where(lane == k, v, block)
    out_ref[...] = block


def _sweep_candidates(d1, d2, n2, interpret):
    """(cand_scores, cand_idx) per d1 row: (N1p, nb2*NCAND) each."""
    nb1 = d1.shape[0] // T1
    nb2 = d2.shape[0] // T2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb1, nb2),
        in_specs=[
            pl.BlockSpec((T1, 128), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((T2, 128), lambda i, j, *_: (j, 0)),
        ],
        out_specs=pl.BlockSpec((T1, 128), lambda i, j, *_: (i, j)),
    )
    out = pl.pallas_call(
        _sweep_kernel,
        out_shape=jax.ShapeDtypeStruct((nb1 * T1, nb2 * 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.atleast_1d(jnp.asarray(n2, jnp.int32)), d1, d2)
    out = out.reshape(d1.shape[0], nb2, 128)[:, :, :2 * NCAND]
    scores = out[:, :, :NCAND].reshape(d1.shape[0], -1)
    idx = out[:, :, NCAND:].reshape(d1.shape[0], -1)
    return scores, idx.astype(jnp.int32)


def _exact_rescore(cand_s, cand_i, d1, d2, n2, k):
    """Gather the approximate top-k candidates per row and rescore them at
    full f32 precision; exact top-2 (and the ratio test downstream) are then
    decided on exact scores, so bfloat16 sweep error can never flip a match.

    Tie-break matches the XLA twin: lowest d2 index wins on equal score.
    """
    big = jnp.int32(2**30)
    neg = jnp.float32(-1e30)
    k = min(k, cand_s.shape[1])
    top_s, pos = jax.lax.top_k(cand_s, k)                     # (N1p, k)
    ci = jnp.take_along_axis(cand_i, pos, axis=1)             # (N1p, k)
    live = (ci < big) & (top_s > neg)
    safe = jnp.clip(ci, 0, d2.shape[0] - 1)
    g = d2[safe]                                              # (N1p, k, 128)
    exact = jnp.einsum(
        "nkd,nd->nk", g, d1, precision=jax.lax.Precision.HIGHEST
    )
    exact = jnp.where(live & (ci < n2), exact, neg)
    best = jnp.max(exact, axis=1)
    bi = jnp.min(
        jnp.where(exact == best[:, None], ci, big), axis=1
    )
    rest = jnp.where(ci == bi[:, None], neg, exact)
    second = jnp.max(rest, axis=1)
    return best, second, jnp.where(bi == big, -1, bi)


@tpu_jit(static_argnames=("use_bf16", "rescore_k", "interpret"))
def match_descriptors_pallas(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    n1: jnp.ndarray,
    n2: jnp.ndarray,
    use_bf16: bool = False,
    rescore_k: int | None = None,
    interpret: bool = False,
):
    """(score, ambiguity, index) per d1 row; Pallas twin of
    ops.match.match_descriptors.

    Three precision tiers:
      - default (``rescore_k=None``): single-pass Precision.HIGHEST online
        top-2 — the exact path.
      - ``rescore_k=8``: hybrid exact — bfloat16x3 candidate sweep + full-
        precision rescore of each row's top-k candidates. Index- and
        score-exact at the f32 level (near-ties on repetitive scenes are
        decided on exact rescored values, see the bf16-flip test), but a
        MEASURED NEGATIVE on v5e (round 5, interleaved minima @16k:
        hybrid 4.60 ms vs HIGHEST 2.04 — the sweep's per-chunk top-2
        bookkeeping alone outweighs the whole exact pass; ROADMAP.md).
        Kept as a tested reference for parts with wider MXUs.
      - ``use_bf16=True``: pure bfloat16 speed tier (no rescore).
    """
    n1_cap = d1.shape[0]
    pad1 = (-n1_cap) % T1
    if pad1:
        d1 = jnp.pad(d1, ((0, pad1), (0, 0)))
    pad2 = (-d2.shape[0]) % T2
    if pad2:
        d2 = jnp.pad(d2, ((0, pad2), (0, 0)))
    nb1 = d1.shape[0] // T1
    nb2 = d2.shape[0] // T2

    if rescore_k is not None and not use_bf16:
        cand_s, cand_i = _sweep_candidates(d1, d2, n2, interpret)
        best, second, index = _exact_rescore(
            cand_s, cand_i, d1, d2, jnp.asarray(n2, jnp.int32), rescore_k
        )
        best = jnp.maximum(best[:n1_cap], 0.0)
        second = jnp.maximum(second[:n1_cap], 0.0)
        index = jnp.maximum(index[:n1_cap], 0)
        return best, second / (best + 1e-6), index

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
