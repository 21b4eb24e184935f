"""Orientation assignment and descriptor extraction vs the golden model."""

import numpy as np
import jax.numpy as jnp

import golden
from cudasift_tpu.ops import orient, descriptor, texture


def make_image(rng, h=64, w=64):
    img = (rng.standard_normal((h, w)) * 30 + 120).astype(np.float32)
    return golden.sep_conv_clamp(img, golden.gaussian_kernel(2, 1.0)).astype(
        np.float32
    )


def test_tex2d_matches_cuda_convention(rng):
    img = make_image(rng, 16, 16)
    xs = rng.uniform(-2, 18, 50)
    ys = rng.uniform(-2, 18, 50)
    ours = np.asarray(texture.tex2d(jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys)))
    ref = [golden.tex2d(img, x, y) for x, y in zip(xs, ys)]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_fast_atan2(rng):
    y = rng.standard_normal(100)
    x = rng.standard_normal(100)
    ours = np.asarray(texture.fast_atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = [golden.fast_atan2(b, a) for b, a in zip(y, x)]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    # Approximation stays within ~0.005 rad of true atan2.
    true = np.arctan2(y, x)
    assert np.abs(ours - true).max() < 0.006


def test_orientation_matches_golden(rng):
    img = make_image(rng)
    pts = [(20.3, 25.7, 1.2), (31.9, 30.1, 2.1), (10.0, 45.5, 1.0), (40.2, 12.8, 3.0)]
    xp = jnp.asarray([p[0] for p in pts])
    yp = jnp.asarray([p[1] for p in pts])
    sc = jnp.asarray([p[2] for p in pts])
    prim, sec, has2 = orient.compute_orientations(jnp.asarray(img), xp, yp, sc)
    for i, (x, y, s) in enumerate(pts):
        ref = golden.compute_orientations(img, x, y, s)
        np.testing.assert_allclose(float(prim[i]), ref[0], rtol=1e-3, atol=0.05)
        assert bool(has2[i]) == (len(ref) == 2)
        if len(ref) == 2:
            np.testing.assert_allclose(float(sec[i]), ref[1], rtol=1e-3, atol=0.05)


def test_descriptor_matches_golden(rng):
    img = make_image(rng)
    pts = [(22.4, 28.1, 1.3, 45.0), (33.0, 30.0, 2.4, 190.5), (15.5, 40.2, 1.0, 0.0)]
    xp = jnp.asarray([p[0] for p in pts])
    yp = jnp.asarray([p[1] for p in pts])
    sc = jnp.asarray([p[2] for p in pts])
    ori = jnp.asarray([p[3] for p in pts])
    desc = np.asarray(
        descriptor.extract_descriptors(jnp.asarray(img), xp, yp, sc, ori)
    )
    for i, (x, y, s, o) in enumerate(pts):
        ref = golden.extract_descriptor(img, x, y, s, o)
        np.testing.assert_allclose(desc[i], ref, rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(np.linalg.norm(desc[i]), 1.0, rtol=1e-5)


def test_descriptor_rotation_covariance(rng):
    # A descriptor at orientation t sampled from an image rotated by -t
    # should roughly match the descriptor at orientation 0 on the original.
    img = make_image(rng)
    d0 = np.asarray(
        descriptor.extract_descriptors(
            jnp.asarray(img),
            jnp.asarray([32.0]), jnp.asarray([32.0]),
            jnp.asarray([1.5]), jnp.asarray([0.0]),
        )
    )
    assert d0.shape == (1, 128)
    assert (d0 >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d0), 1.0, rtol=1e-5)
    # Values are clamped at 0.2 *before* the second normalization
    # (cudaSiftD.cu:398), so the final ceiling is 0.2/||clamped||.
    assert d0.max() <= 0.2 / np.linalg.norm(np.minimum(d0, 0.2)) + 1e-3
