"""Glue primitives XLA lowers poorly on TPU: 1-D prefix sums and lane stacks.

Two measured pathologies in the extraction program (chrome-trace, 1080p):

- ``jnp.cumsum`` over a 1-D int array lowers to a SERIAL scan on the scalar
  core: ~4.6 ns/element, 136 us for the 29440-slot merge mask alone, with
  every per-octave compaction paying proportionally. The reference never
  meets this cost class — its compaction is an atomicInc append
  (cudaSiftD.cu:1420); our deterministic replacement needs the prefix sum,
  so it has to be fast. ``mask_cumsum`` computes it on the MXU: chunk the
  mask into 512-lane rows and multiply by a constant triangular matrix.
  0/1 inputs are EXACT in bf16 and the MXU accumulates in f32, so the
  result is bit-exact for any mask length < 2^24.

- ``jnp.stack([...K scalar fields...], axis=-1)`` materializes each (n, 1)
  column into a T(8,128)-tiled lane slot: ~26 us per table at n ~= 5000,
  several tables per frame. ``lane_stack`` builds the same (n, K) table as
  one iota-select loop fusion (~1-2 us).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_R = 512  # chunk width: one MXU operand, matches the compaction radix


@lru_cache(maxsize=1)
def _tri_np():
    # T[k, j] = 1 for k <= j: (v @ T)[j] = sum_{k <= j} v[k] (inclusive).
    #
    # MUST be numpy, never jax (match the convolve._band_matrix precedent):
    # the first call happens inside a jit trace on TPU, and caching a traced
    # jax array poisons every later trace with UnexpectedTracerError (the
    # round-4 bench killer). jnp.asarray per call hands each trace its own
    # constant.
    return np.triu(np.ones((_R, _R), np.float32))


def _tri_bf16():
    return jnp.asarray(_tri_np(), dtype=jnp.bfloat16)


def mask_cumsum(valid: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a 1-D 0/1 mask, as int32. Bit-exact.

    MXU form of ``jnp.cumsum(valid.astype(int32))`` (see module docstring);
    inputs MUST be boolean — general integers would round in the bf16
    operand cast, so non-bool dtypes are rejected loudly. On CPU the
    serial scan is already fast; keep it (the two forms agree exactly,
    golden-tested).
    """
    if valid.dtype != jnp.bool_:
        raise TypeError(f"mask_cumsum needs a boolean mask, got {valid.dtype}")
    n = valid.shape[0]
    if jax.default_backend() == "cpu" or n < 2 * _R:
        return jnp.cumsum(valid.astype(jnp.int32))
    return _matmul_cumsum(valid)


def _matmul_cumsum(valid: jnp.ndarray) -> jnp.ndarray:
    n = valid.shape[0]
    pad = (-n) % _R
    v = jnp.pad(valid.astype(jnp.bfloat16), (0, pad))
    m = v.reshape(-1, _R)                                    # (g, 512)
    within = jax.lax.dot_general(
        m, _tri_bf16(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (g, 512)
    totals = within[:, -1]                                   # (g,) <= 512
    # Cross-chunk offsets: g <= ~64 for every octave size; the serial scan
    # on so few elements costs well under a microsecond.
    offsets = jnp.cumsum(totals) - totals                    # exclusive
    out = (within + offsets[:, None]).astype(jnp.int32)
    return out.reshape(-1)[:n]


def lane_stack(cols: list[jnp.ndarray], dtype=jnp.float32) -> jnp.ndarray:
    """(n, K) table from K (n,) columns as ONE loop fusion.

    Value-identical to ``jnp.stack(cols, axis=1).astype(dtype)`` — note the
    cast: every column is coerced to ``dtype`` (default float32), so integer
    columns round-trip exactly only below 2^24. Lowers to a single
    iota-select pass instead of K one-lane tiled materializations.
    """
    k = len(cols)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    acc = cols[0].astype(dtype)[:, None]
    for f in range(1, k):
        acc = jnp.where(lane == f, cols[f].astype(dtype)[:, None], acc)
    return acc
