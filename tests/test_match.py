"""Matcher vs golden brute force (the CheckMatches analogue, match.cu:132)."""

import numpy as np
import jax
import jax.numpy as jnp

import golden
from cudasift_tpu.ops.match import match_descriptors, match_sift_data
from cudasift_tpu.sift_data import init_sift_data


def random_descriptors(rng, n):
    d = rng.standard_normal((n, 128)).astype(np.float32)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def test_matcher_exact_vs_golden(rng):
    d1 = random_descriptors(rng, 300)
    d2 = random_descriptors(rng, 443)  # non-multiple of tile
    best, amb, idx = jax.jit(match_descriptors, static_argnames=("tile",))(
        jnp.asarray(d1), jnp.asarray(d2), jnp.int32(300), jnp.int32(443), tile=64
    )
    gb, ga, gi = golden.match_brute_force(d1.astype(np.float64), d2.astype(np.float64))
    np.testing.assert_array_equal(np.asarray(idx), gi)
    np.testing.assert_allclose(np.asarray(best), gb, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(amb), ga, rtol=1e-4, atol=1e-5)


def test_matcher_respects_counts(rng):
    # Padded/invalid rows of d2 must never be matched.
    d1 = random_descriptors(rng, 64)
    d2 = np.zeros((128, 128), np.float32)
    d2[:32] = random_descriptors(rng, 32)
    d2[32:] = d1[:96] if False else 10.0  # huge garbage beyond n2
    best, amb, idx = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), jnp.int32(64), jnp.int32(32), tile=64
    )
    assert (np.asarray(idx) < 32).all()
    gb, _, gi = golden.match_brute_force(
        d1.astype(np.float64), d2[:32].astype(np.float64)
    )
    np.testing.assert_array_equal(np.asarray(idx), gi)


def test_match_sift_data_fills_fields(rng):
    n = 100
    data1 = init_sift_data(256)
    data2 = init_sift_data(256)
    d = random_descriptors(rng, n)
    perm = rng.permutation(n)
    data1.data = data1.data.at[:n].set(jnp.asarray(d))
    data2.data = data2.data.at[:n].set(jnp.asarray(d[perm]))
    data1.num_pts = jnp.int32(n)
    data2.num_pts = jnp.int32(n)
    data2.xpos = data2.xpos.at[:n].set(jnp.arange(n, dtype=jnp.float32))
    inv = np.argsort(perm)
    out = match_sift_data(data1, data2)
    np.testing.assert_array_equal(np.asarray(out.match)[:n], inv)
    np.testing.assert_allclose(np.asarray(out.score)[:n], 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.match_xpos)[:n], inv.astype(np.float32)
    )
    # Slots past num_pts stay inert.
    assert (np.asarray(out.match)[n:] == -1).all()
    assert (np.asarray(out.score)[n:] == 0).all()
