"""Multi-chip scaling — meshes, batched extraction, sharded matching.

The reference is strictly single-GPU (SURVEY.md section 2: no NCCL/MPI, no
multi-stream). The TPU-native scale-out story (SURVEY.md section 5.8):

- **Batched extraction is data-parallel over images**: the per-image pipeline
  has no cross-image dataflow, so sharding the batch axis of a vmapped
  ``extract_sift`` over the mesh lets XLA's SPMD partitioner run every octave
  of every image independently per chip — zero collectives.
- **Large matching is model-parallel over the second descriptor set**: each
  chip streams its resident slab of ``d2`` against the full (replicated)
  ``d1`` with a local fused top-2, then a tiny all-gather of (best, second,
  index) triples — 12 bytes/query/chip — merges over ICI. This preserves the
  O(N) memory property of the blocked matcher (README.md:49) *and* never
  materializes cross-chip score traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SiftParams
from ..utils.jit import tpu_jit
from ..pipeline import _extract_sift_traced
from ..sift_data import SiftData
from ..ops.match import match_descriptors


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), (axis,))


def extract_sift_batched(
    images: jnp.ndarray,
    params: SiftParams,
    mesh: Mesh | None = None,
    axis: str = "data",
) -> SiftData:
    """Extract SIFT from a batch of same-shaped images, data-parallel.

    images: (B, H, W). Returns a SiftData whose fields carry a leading batch
    dimension. With a mesh, the batch axis is sharded across devices.
    """

    @tpu_jit(static_argnames=("p",))
    def run(imgs, p):
        return jax.vmap(lambda im: _extract_sift_traced(im, p))(imgs)

    if mesh is not None:
        # Shard the batch axis; XLA's SPMD partitioner propagates it through
        # the whole per-image pipeline without inserting collectives.
        images = jax.device_put(images, NamedSharding(mesh, P(axis)))
    return run(images, params)


def extract_sift_throughput_sharded(
    images: jnp.ndarray,
    params: SiftParams,
    mesh: Mesh,
    axis: str = "data",
) -> SiftData:
    """Pod-scale extraction: DP over frames x the throughput layout per chip.

    The production configuration (ROADMAP multi-chip item): the batch axis
    shards over the mesh and each device runs the UNROLLED multi-frame
    program (`pipeline._extract_batch_jit`) on its local shard — unlike
    `extract_sift_batched`'s vmap, whose batched Pallas kernels serialize
    with extra grid overhead on real TPUs. Zero collectives; frames feed
    over DCN, results gather on demand.

    images: (B, H, W) with B divisible by the mesh size. Returns SiftData
    with a leading sharded batch axis.
    """
    from jax.sharding import NamedSharding

    n_dev = mesh.devices.size
    if images.shape[0] % n_dev:
        raise ValueError(
            f"batch {images.shape[0]} not divisible by mesh size {n_dev}"
        )
    from ..pipeline import _extract_batch_jit

    fn = tpu_jit(jax.shard_map(
        lambda im: _extract_batch_jit(im, params),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
    ))
    images = jax.device_put(images, NamedSharding(mesh, P(axis)))
    return fn(images)


def match_descriptors_sharded(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    n1: jnp.ndarray,
    n2: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    tile: int = 512,
):
    """Sharded brute-force top-2 matching of d1 against d2.

    d2's capacity axis is sharded over the mesh; d1 is replicated. Each shard
    computes a local (best, second, index) with globally offset indices, and
    a final cross-shard merge reduces the per-device triples. Indices from
    different shards are structurally distinct, so the merge needs no
    deduplication (cf. matching.cu:378-396).
    """
    n_dev = mesh.devices.size
    cap2 = d2.shape[0]
    pad = (-cap2) % (n_dev * tile)
    if pad:
        d2 = jnp.pad(d2, ((0, pad), (0, 0)))
    shard = d2.shape[0] // n_dev

    def local_match(d1_full, d2_local, n1_, n2_):
        idx = jax.lax.axis_index(axis)
        offset = idx * shard
        n2_local = jnp.clip(n2_ - offset, 0, shard)
        best, _amb, match = match_descriptors(
            d1_full, d2_local, n1_, n2_local, tile=tile, axis_name=axis
        )
        # Recover raw second-best from ambiguity for the cross-shard merge.
        second = _amb * (best + 1e-6)
        match = match + offset
        # Gather the triples from every shard: (n_dev, N1).
        bests = jax.lax.all_gather(best, axis)
        seconds = jax.lax.all_gather(second, axis)
        matches = jax.lax.all_gather(match, axis)
        win = jnp.argmax(bests, axis=0)
        best_g = jnp.take_along_axis(bests, win[None], axis=0)[0]
        match_g = jnp.take_along_axis(matches, win[None], axis=0)[0]
        masked = bests.at[win, jnp.arange(bests.shape[1])].set(-jnp.inf)
        second_g = jnp.maximum(jnp.max(masked, axis=0), jnp.max(seconds, axis=0))
        return best_g, second_g, match_g

    fn = tpu_jit(jax.shard_map(
        local_match,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        # Outputs are replicated by construction (all_gather + same merge on
        # every shard); the varying-axis checker can't infer that.
        check_vma=False,
    ))
    best, second, match = fn(d1, d2, n1, n2)
    best = jnp.maximum(best, 0.0)
    second = jnp.maximum(second, 0.0)
    ambiguity = second / (best + 1e-6)
    return best, ambiguity, jnp.maximum(match, 0)
