"""Smoke tests for auxiliary surfaces: printers, device info, utils package."""

import numpy as np
import jax.numpy as jnp


def test_utils_package_paths():
    # Import the subpackages explicitly — `cs.utils` only exists as an
    # attribute after some module imports it, so relying on another test
    # to have done so made this test order-dependent.
    from cudasift_tpu.utils import io, timers, viz

    assert callable(io.imread_gray)
    assert callable(viz.draw_match_data)
    assert callable(timers.time_fn)


def test_print_sift_data(capsys):
    import cudasift_tpu as cs

    d = cs.init_sift_data(64)
    d.num_pts = jnp.int32(1)
    d.xpos = d.xpos.at[0].set(12.34)
    d.data = d.data.at[0].set(1.0 / np.sqrt(128.0))
    cs.print_sift_data(d)
    out = capsys.readouterr().out
    assert "xpos         = 12.34" in out
    assert "Number of available points: 1" in out
    assert "data = " in out


def test_device_info(capsys):
    import cudasift_tpu as cs

    cs.device_info()
    out = capsys.readouterr().out
    assert "Device name:" in out


def test_mask_cumsum_matmul_exact():
    """The MXU triangular-matmul prefix sum is bit-exact vs jnp.cumsum for
    0/1 masks of every length class (sub-chunk tail, multi-chunk, dense,
    sparse, empty). Covers the TPU branch of ops.scan.mask_cumsum, which
    replaced the serial scan in every compaction (136 us at the 1080p
    merge, chrome trace)."""
    from cudasift_tpu.ops.scan import _matmul_cumsum, mask_cumsum

    rng = np.random.default_rng(7)
    for n in (1, 511, 512, 513, 14720, 29440):
        for p in (0.0, 0.03, 0.5, 1.0):
            m = jnp.asarray(rng.random(n) < p)
            want = np.cumsum(np.asarray(m).astype(np.int32))
            got = np.asarray(_matmul_cumsum(m))
            assert got.dtype == np.int32
            np.testing.assert_array_equal(got, want, err_msg=f"n={n} p={p}")
            np.testing.assert_array_equal(np.asarray(mask_cumsum(m)), want)


def test_matmul_cumsum_under_two_jits():
    """Regression: round 4 cached `_tri_bf16` as a JAX array built with
    lax ops under lru_cache; the first call inside a jit trace poisoned the
    cache with a tracer and EVERY later distinct jit raised
    UnexpectedTracerError (killed BENCH_r04, broke find_homography on TPU).
    Tracing the matmul path under two different jits reproduces the leak
    class without a TPU."""
    import jax
    from cudasift_tpu.ops import scan

    scan._tri_np.cache_clear()
    m = jnp.asarray(np.arange(1200) % 3 == 0)
    a = jax.jit(lambda v: scan._matmul_cumsum(v).sum())(m)
    b = jax.jit(lambda v: scan._matmul_cumsum(v)[-1] * 2)(m)
    want = int(np.cumsum((np.arange(1200) % 3 == 0).astype(np.int32)).sum())
    assert int(a) == want
    assert int(b) == 2 * 400
    # Eager call after jitted ones must also survive.
    np.testing.assert_array_equal(
        np.asarray(scan._matmul_cumsum(m))[-1], 400)


def test_mask_cumsum_rejects_non_bool():
    import pytest
    from cudasift_tpu.ops.scan import mask_cumsum

    with pytest.raises(TypeError):
        mask_cumsum(jnp.ones(8, jnp.int32))


def test_lane_stack_matches_stack():
    from cudasift_tpu.ops.scan import lane_stack

    rng = np.random.default_rng(3)
    cols = [jnp.asarray(rng.standard_normal(777), jnp.float32)
            for _ in range(8)]
    want = jnp.stack(cols, axis=1)
    np.testing.assert_array_equal(np.asarray(lane_stack(cols)),
                                  np.asarray(want))
    ints = [jnp.asarray(rng.integers(0, 1000, 64), jnp.int32)
            for _ in range(3)]
    np.testing.assert_array_equal(
        np.asarray(lane_stack(ints)),
        np.asarray(jnp.stack(ints, axis=1)).astype(np.float32))
