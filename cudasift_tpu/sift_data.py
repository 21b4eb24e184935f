"""Fixed-capacity keypoint container — the TPU analogue of ``SiftData``.

The reference stores an AoS of 144-float ``SiftPoint`` records with host and
device mirrors (cudaSift.h:6-33). On TPU an SoA pytree of fixed-capacity
arrays is the natural layout: every field is a lane-contiguous vector, the
descriptor matrix feeds the MXU matcher directly, and the whole structure
passes through ``jit``/``vmap``/``shard_map`` untouched.

Capacity (``max_pts``) is static; ``num_pts`` is a traced scalar. Slots at or
beyond ``num_pts`` are zero. Overflow is EXPLICIT: ``overflow`` counts
candidates dropped at any fixed-capacity stage (per-octave candidate caps +
the global ``max_pts`` clamp) — the reference only clamps visibly into the
last slot (cudaSiftD.cu:1420-1421) and per-stage drops there are silent.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SiftData:
    """SoA keypoint set. Field names mirror cudaSift.h:6-22."""

    num_pts: jnp.ndarray      # () int32
    xpos: jnp.ndarray         # (max_pts,) f32
    ypos: jnp.ndarray         # (max_pts,) f32
    scale: jnp.ndarray        # (max_pts,) f32
    sharpness: jnp.ndarray    # (max_pts,) f32
    edgeness: jnp.ndarray     # (max_pts,) f32
    orientation: jnp.ndarray  # (max_pts,) f32, degrees
    score: jnp.ndarray        # (max_pts,) f32
    ambiguity: jnp.ndarray    # (max_pts,) f32
    match: jnp.ndarray        # (max_pts,) int32
    match_xpos: jnp.ndarray   # (max_pts,) f32
    match_ypos: jnp.ndarray   # (max_pts,) f32
    match_error: jnp.ndarray  # (max_pts,) f32
    subsampling: jnp.ndarray  # (max_pts,) f32
    data: jnp.ndarray         # (max_pts, 128) f32 descriptors
    # () int32: candidates/points dropped by capacity limits during
    # extraction (per-octave candidate caps + the global max_pts clamp).
    # 0 on every in-envelope input; nonzero means results are valid but
    # incomplete — raise max_pts / candidate_fraction (SURVEY.md section
    # 5.3 failure-reporting analogue).
    overflow: jnp.ndarray = None

    @property
    def max_pts(self) -> int:
        return self.xpos.shape[0]

    def valid_mask(self) -> jnp.ndarray:
        return jnp.arange(self.max_pts) < self.num_pts


def init_sift_data(num: int = 1024) -> SiftData:
    """Allocate an empty keypoint set (InitSiftData, cudaSiftH.cu:234-249)."""
    z = jnp.zeros((num,), jnp.float32)
    return SiftData(
        num_pts=jnp.zeros((), jnp.int32),
        xpos=z, ypos=z, scale=z, sharpness=z, edgeness=z, orientation=z,
        score=z, ambiguity=z,
        match=jnp.full((num,), -1, jnp.int32),
        match_xpos=z, match_ypos=z, match_error=z, subsampling=z,
        data=jnp.zeros((num, 128), jnp.float32),
        overflow=jnp.zeros((), jnp.int32),
    )


def print_sift_data(data: SiftData, max_points: int | None = None) -> None:
    """Structured dump of a point set (PrintSiftData, cudaSiftH.cu:266-302)."""
    n = int(data.num_pts)
    host = jax.device_get(data)
    for i in range(n if max_points is None else min(n, max_points)):
        print(f"xpos         = {host.xpos[i]:.2f}")
        print(f"ypos         = {host.ypos[i]:.2f}")
        print(f"scale        = {host.scale[i]:.2f}")
        print(f"sharpness    = {host.sharpness[i]:.2f}")
        print(f"edgeness     = {host.edgeness[i]:.2f}")
        print(f"orientation  = {host.orientation[i]:.2f}")
        print(f"score        = {host.score[i]:.2f}")
        desc = np.asarray(host.data[i])
        for j in range(8):
            prefix = "data = " if j == 0 else "       "
            row = "".join(
                " .   " if desc[j + 8 * k] < 0.05 else f"{desc[j + 8 * k]:.2f} "
                for k in range(16)
            )
            print(prefix + row)
    print(f"Number of available points: {n}")
    print(f"Number of allocated points: {data.max_pts}")


def ref_style_num_pts(data: SiftData) -> int:
    """numPts as the reference reports it.

    The reference under-reports: it reads d_PointCounter[2*numOctaves]
    (cudaSiftH.cu:115), which excludes the full-resolution octave's
    second-orientation duplicates even though their descriptors are
    extracted (cudaSiftD.cu:1039-1053). We report every extracted point in
    ``num_pts`` (documented deviation, ROADMAP.md); this trims the trailing
    duplicate block to reproduce the reference's accounting — the basis for
    like-for-like comparison against the README tables (README.md:111-134).
    """
    n = int(data.num_pts)
    xs = np.asarray(data.xpos)[:n]
    ys = np.asarray(data.ypos)[:n]
    sc = np.asarray(data.scale)[:n]
    seen: set = set()
    is_dup = np.zeros(n, bool)
    for i in range(n):
        key = (xs[i], ys[i], sc[i])
        is_dup[i] = key in seen
        seen.add(key)
    k = 0
    while k < n and is_dup[n - 1 - k]:
        k += 1
    return n - k
