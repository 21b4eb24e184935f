"""Hand-rolled batched Gauss-Jordan vs numpy."""

import numpy as np
import jax.numpy as jnp

from cudasift_tpu.ops.linalg import solve_batched


def test_solve_batched_matches_numpy(rng):
    a = rng.standard_normal((32, 8, 8)).astype(np.float32)
    b = rng.standard_normal((32, 8)).astype(np.float32)
    ours = np.asarray(solve_batched(jnp.asarray(a), jnp.asarray(b)))
    ref = np.linalg.solve(a.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)


def test_solve_batched_needs_pivoting(rng):
    # Zero leading pivot forces a row swap.
    a = np.array([[[0.0, 1.0], [1.0, 0.0]]], np.float32)
    b = np.array([[2.0, 3.0]], np.float32)
    ours = np.asarray(solve_batched(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, [[3.0, 2.0]], atol=1e-6)


def test_solve_batched_singular_stays_finite_mask():
    a = np.zeros((1, 3, 3), np.float32)
    b = np.ones((1, 3), np.float32)
    ours = np.asarray(solve_batched(jnp.asarray(a), jnp.asarray(b)))
    # Singular input: result is garbage but the call never crashes; callers
    # mask by isfinite.
    assert ours.shape == (1, 3)
