"""RANSAC + refinement vs golden DLT / known transforms."""

import numpy as np
import jax
import jax.numpy as jnp

import golden
from cudasift_tpu.ops import homography as H
from cudasift_tpu.sift_data import init_sift_data


def make_matched_data(rng, n=200, max_pts=512, outlier_frac=0.25,
                      noise=0.3):
    h_true = np.array(
        [[1.02, 0.03, 15.0], [-0.02, 0.98, -7.0], [1e-5, -2e-5, 1.0]]
    )
    x1 = rng.uniform(20, 600, n)
    y1 = rng.uniform(20, 400, n)
    den = h_true[2, 0] * x1 + h_true[2, 1] * y1 + 1.0
    x2 = (h_true[0, 0] * x1 + h_true[0, 1] * y1 + h_true[0, 2]) / den
    y2 = (h_true[1, 0] * x1 + h_true[1, 1] * y1 + h_true[1, 2]) / den
    x2 += rng.normal(0, noise, n)
    y2 += rng.normal(0, noise, n)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    x2[out_idx] = rng.uniform(0, 600, n_out)
    y2[out_idx] = rng.uniform(0, 400, n_out)

    data = init_sift_data(max_pts)
    data.num_pts = jnp.int32(n)
    data.xpos = data.xpos.at[:n].set(jnp.asarray(x1, jnp.float32))
    data.ypos = data.ypos.at[:n].set(jnp.asarray(y1, jnp.float32))
    data.match_xpos = data.match_xpos.at[:n].set(jnp.asarray(x2, jnp.float32))
    data.match_ypos = data.match_ypos.at[:n].set(jnp.asarray(y2, jnp.float32))
    data.score = data.score.at[:n].set(0.9)
    data.ambiguity = data.ambiguity.at[:n].set(0.5)
    return data, h_true, out_idx


def test_dlt_batch_matches_golden(rng):
    src = rng.uniform(0, 500, (6, 4, 2))
    dst = rng.uniform(0, 500, (6, 4, 2))
    ours = np.asarray(H._dlt_batch(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32)))
    for i in range(6):
        ref = golden.homography_dlt(src[i], dst[i])
        np.testing.assert_allclose(ours[i], ref, rtol=2e-3, atol=1e-3)


def test_inlier_counts_match_golden(rng):
    src = rng.uniform(0, 500, (50, 2))
    dst = src * 1.01 + rng.normal(0, 1.0, (50, 2))
    h8 = np.array([1.01, 0, 0, 0, 1.01, 0, 0, 0], np.float32)
    ours = H._inlier_counts(
        jnp.asarray(h8[None]),
        jnp.asarray(src[None, :, 0], jnp.float32), jnp.asarray(src[None, :, 1], jnp.float32),
        jnp.asarray(dst[None, :, 0], jnp.float32), jnp.asarray(dst[None, :, 1], jnp.float32),
        jnp.ones(50, bool), 3.0,
    )
    ref = golden.count_inliers(h8.astype(np.float64), src, dst, 3.0)
    counts, msac = ours
    assert int(counts[0]) == ref
    # MSAC score: truncated quadratic, bounded by N * thresh^2.
    assert 0.0 < float(msac[0]) < 50 * 9.0


def test_sample_distinct_quads():
    quads = H._sample_distinct_quads(jax.random.PRNGKey(0), 500, jnp.int32(9))
    q = np.asarray(quads)
    assert q.min() >= 0 and q.max() < 9
    for row in q:
        assert len(set(row.tolist())) == 4


def test_find_homography_recovers_transform(rng):
    data, h_true, _ = make_matched_data(rng)
    h, nm = jax.jit(H.find_homography, static_argnames=("num_loops",))(
        data, jax.random.PRNGKey(3), num_loops=512,
        min_score=0.5, max_ambiguity=0.8, thresh=3.0,
    )
    assert int(nm) > 120  # most of the 150 inliers found
    np.testing.assert_allclose(np.asarray(h), h_true, rtol=0.05, atol=1.0)


def test_improve_homography_tightens(rng):
    data, h_true, out_idx = make_matched_data(rng, noise=0.5)
    h0 = jnp.asarray(h_true * np.array([[1.01], [0.99], [1.0]]), jnp.float32)
    h, numfit, err = jax.jit(H.improve_homography, static_argnames=("num_loops",))(
        data, h0, 5, 0.0, 0.8, 3.0
    )
    n = int(data.num_pts)
    inl = np.setdiff1d(np.arange(n), out_idx)
    np.testing.assert_allclose(np.asarray(h), h_true, rtol=0.02, atol=0.5)
    # errors small on inliers, match_error populated
    assert np.median(np.asarray(err)[inl]) < 2.0
    assert int(numfit) >= len(inl) * 0.9


def test_find_homography_too_few_valid():
    data = init_sift_data(64)
    data.num_pts = jnp.int32(4)
    h, nm = H.find_homography(data, jax.random.PRNGKey(0), num_loops=64)
    assert int(nm) == 0
    np.testing.assert_allclose(np.asarray(h), np.eye(3))


def test_weighted_lstsq8_matches_numpy(rng):
    """QR least squares vs numpy lstsq on a well-conditioned weighted
    system, and perspective-row recovery on a small clustered support (the
    regime where f32 normal equations fail, ops/linalg.py)."""
    from cudasift_tpu.ops.linalg import weighted_lstsq8

    n = 500
    ya = rng.normal(0, 1, (n, 8)).astype(np.float32)
    yb = rng.normal(0, 1, (n, 8)).astype(np.float32)
    truth = rng.normal(0, 1, 8)
    bx = (ya @ truth).astype(np.float32)
    by = (yb @ truth).astype(np.float32)
    w = (rng.uniform(0, 1, n) < 0.3).astype(np.float32)
    a, ok = weighted_lstsq8(
        jnp.asarray(ya), jnp.asarray(yb), jnp.asarray(w),
        jnp.asarray(bx), jnp.asarray(by))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(a), truth, rtol=2e-4, atol=2e-4)

    # Degenerate: fewer than 4 weighted rows -> not ok.
    w4 = np.zeros(n, np.float32)
    w4[:3] = 1.0
    _, ok4 = weighted_lstsq8(
        jnp.asarray(ya), jnp.asarray(yb), jnp.asarray(w4),
        jnp.asarray(bx), jnp.asarray(by))
    assert not bool(ok4)
