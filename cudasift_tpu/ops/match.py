"""Brute-force descriptor matching — MXU matmul with fused online top-2.

TPU-native reimagining of ``FindMaxCorr10`` (matching.cu:301-397). The CUDA
kernel keeps 32 descriptors resident in shared memory and streams the second
set in 32-wide tiles with register-tiled dot products and a running top-2 —
explicitly to avoid an O(N1*N2) score matrix (README.md:49).

Here the same O(N) memory property falls out of a ``lax.scan`` over tiles of
the second set: each step is one (N1, 128) x (128, T) MXU matmul followed by
a per-row top-2 merge. Because tiles are disjoint, merging two (best, second,
index) triples never needs the reference's index-deduplication pass
(matching.cu:378-396) — distinctness is structural.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sift_data import SiftData


def match_descriptors(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    n1: jnp.ndarray,
    n2: jnp.ndarray,
    tile: int = 2048,
    use_bf16: bool = False,
    axis_name: str | None = None,
):
    """Best/second-best cosine scores of ``d1`` rows against ``d2`` rows.

    d1: (N1, 128), d2: (N2, 128) with only the first n1/n2 rows valid.
    Returns (score, ambiguity, match_index) arrays of length N1, with
    ambiguity = second / (best + 1e-6) (matching.cu:395).

    ``axis_name``: set when called inside ``shard_map`` over that mesh axis —
    the scan carry must be marked varying along the manual axis.
    """
    n1_cap, dim = d1.shape
    n2_cap = d2.shape[0]
    pad = (-n2_cap) % tile
    if pad:
        d2 = jnp.pad(d2, ((0, pad), (0, 0)))
    num_tiles = d2.shape[0] // tile
    d2_tiles = d2.reshape(num_tiles, tile, dim)

    if use_bf16:
        d1c = d1.astype(jnp.bfloat16)
        d2_tiles = d2_tiles.astype(jnp.bfloat16)
        precision = None
    else:
        d1c = d1
        precision = "highest"

    neg = jnp.float32(-jnp.inf)

    def step(carry, inp):
        best, second, index = carry
        tile_idx, d2_tile = inp
        scores = jnp.dot(
            d1c, d2_tile.T, preferred_element_type=jnp.float32,
            precision=precision,
        )
        col = tile_idx * tile + jnp.arange(tile, dtype=jnp.int32)
        scores = jnp.where((col < n2)[None, :], scores, neg)
        t_arg = jnp.argmax(scores, axis=1)
        t_best = jnp.max(scores, axis=1)
        # Second-best via masked select (scatter-free; TPU scatters serialize).
        in_tile = jnp.arange(tile, dtype=jnp.int32)
        masked = jnp.where(in_tile[None, :] == t_arg[:, None], neg, scores)
        t_second = jnp.max(masked, axis=1)
        t_index = (col[0] + t_arg).astype(jnp.int32)
        # Merge two triples from disjoint index sets.
        new_best = jnp.maximum(best, t_best)
        new_index = jnp.where(t_best > best, t_index, index)
        new_second = jnp.maximum(jnp.minimum(best, t_best),
                                 jnp.maximum(second, t_second))
        return (new_best, new_second, new_index), None

    init = (
        jnp.full((n1_cap,), neg, jnp.float32),
        jnp.full((n1_cap,), neg, jnp.float32),
        jnp.full((n1_cap,), -1, jnp.int32),
    )
    if axis_name is not None:
        init = jax.lax.pcast(init, axis_name, to="varying")
    (best, second, index), _ = jax.lax.scan(
        step, init, (jnp.arange(num_tiles, dtype=jnp.int32), d2_tiles)
    )
    best = jnp.maximum(best, 0.0)  # reference starts from cleaned 0 scores
    second = jnp.maximum(second, 0.0)
    index = jnp.maximum(index, 0)
    ambiguity = second / (best + 1e-6)
    return best, ambiguity, index


def match_sift_data(
    data1: SiftData, data2: SiftData, tile: int | None = None,
    use_bf16: bool | None = None, use_pallas: bool = True,
    params=None,
) -> SiftData:
    """MatchSiftData (matching.cu:1090-1206): fill score/ambiguity/match and
    the matched point's coordinates into ``data1``.

    On TPU the fused Pallas matcher runs by default; the XLA scan matcher is
    the CPU / fallback path. ``params`` (a ``config.MatchParams``) supplies
    the defaults for ``tile``/``use_bf16``; explicit keyword arguments win.
    """
    from ..config import MatchParams

    p = params if params is not None else MatchParams()
    tile = p.tile_n2 if tile is None else tile
    use_bf16 = p.use_bf16 if use_bf16 is None else use_bf16
    if use_pallas and jax.default_backend() not in ("cpu",):
        from .pallas.match import match_descriptors_pallas

        best, ambiguity, index = match_descriptors_pallas(
            data1.data, data2.data, data1.num_pts, data2.num_pts,
            use_bf16=use_bf16,
        )
    else:
        best, ambiguity, index = match_descriptors(
            data1.data, data2.data, data1.num_pts, data2.num_pts, tile, use_bf16
        )
    valid = data1.valid_mask()
    z = jnp.float32(0.0)
    import dataclasses

    return dataclasses.replace(
        data1,
        score=jnp.where(valid, best, z),
        ambiguity=jnp.where(valid, ambiguity, z),
        match=jnp.where(valid, index, -1),
        match_xpos=jnp.where(valid, data2.xpos[index], z),
        match_ypos=jnp.where(valid, data2.ypos[index], z),
    )
