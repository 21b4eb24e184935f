"""Count-gated Pallas compaction vs the XLA radix-512 rank search.

The two must agree bit for bit: compaction order defines the deterministic
keypoint order (our replacement for the reference's racy atomicInc appends,
cudaSiftD.cu:1418-1428).

Marked ``slow``: compact_mask_pallas is OFF by default (the XLA rank
search won its A/B, ROADMAP.md; the kernel is wired behind
SiftParams.use_pallas_compact for capacity >> count workloads) —
interpret-mode traces of a non-default kernel shouldn't tax the fast
suite (~40 s of it on this 1-core host).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cudasift_tpu.ops.detect import compact_mask
from cudasift_tpu.ops.pallas.compact import compact_mask_pallas

pytestmark = pytest.mark.slow


def _check(mask, cap):
    ref_idx, ref_cnt = compact_mask(jnp.asarray(mask), cap)
    got_idx, got_cnt = compact_mask_pallas(jnp.asarray(mask), cap,
                                           interpret=True)
    assert int(ref_cnt) == int(got_cnt)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))
    return int(got_cnt)


def test_compact_kernel_matches_xla(rng):
    # Basic: overflow (count == cap) and undercapacity (count < cap).
    mask = rng.random((5, 96, 160)) < 0.01
    assert _check(mask, 256) == 256
    mask = rng.random((5, 96, 160)) < 0.001
    assert 0 < _check(mask, 1024) < 1024


def test_compact_kernel_edge_shapes(rng):
    # Voxel count not a multiple of the 4096-entry region (padding path),
    # plus an empty mask and a dense near-full chunk.
    mask = rng.random((5, 200, 334)) < 0.003
    _check(mask, 384)
    _check(np.zeros((5, 64, 128), bool), 128)
    mask = rng.random((5, 30, 40)) < 0.5
    assert _check(mask, 512) == 512


def test_compact_kernel_multirow_l1(rng):
    # > 512 chunks so the one-hot mid-level matmul spans multiple L1 rows.
    mask = rng.random((5, 540, 960)) < 0.0015
    cnt = _check(mask, 5120)
    assert 0 < cnt < 5120
