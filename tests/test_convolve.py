"""Preprocessing convolutions vs the numpy golden model."""

import numpy as np
import jax.numpy as jnp

import golden
from cudasift_tpu.config import gaussian_kernel_1d, laplace_kernels
from cudasift_tpu.ops import convolve


def test_gaussian_kernel_matches_reference_construction():
    # ScaleDown 5-tap kernel, variance 0.5 (cudaSiftH.cu:315-325).
    ours = gaussian_kernel_1d(2, 0.5)
    ref = golden.gaussian_kernel(2, 0.5)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    assert abs(ours.sum() - 1.0) < 1e-6


def test_laplace_kernel_table():
    ours = laplace_kernels(5)
    ref = golden.laplace_kernel_table(5)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)
    # Octave blur accumulation: sqrt(b^2+0.25)/2 starting at 0.
    assert not np.allclose(ours[0], ours[1])
    np.testing.assert_allclose(ours[3], ours[4], atol=5e-4)  # converges


def test_low_pass(rng):
    img = rng.standard_normal((37, 53)).astype(np.float32) * 50
    ours = np.asarray(convolve.low_pass(jnp.asarray(img), 1.0))
    ref = golden.low_pass(img, 1.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_scale_down(rng):
    img = rng.standard_normal((38, 54)).astype(np.float32) * 50
    ours = np.asarray(convolve.scale_down(jnp.asarray(img)))
    ref = golden.scale_down(img)
    assert ours.shape == (19, 27)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_scale_down_odd(rng):
    img = rng.standard_normal((39, 55)).astype(np.float32)
    ours = np.asarray(convolve.scale_down(jnp.asarray(img)))
    assert ours.shape == (19, 27)


def test_scale_up(rng):
    img = rng.standard_normal((13, 17)).astype(np.float32)
    ours = np.asarray(convolve.scale_up(jnp.asarray(img)))
    ref = golden.scale_up(img)
    assert ours.shape == (26, 34)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_blur_multi_matches_per_scale_conv(rng):
    img = rng.standard_normal((33, 47)).astype(np.float32) * 30
    kernels = laplace_kernels(3)[1]
    ours = np.asarray(convolve.blur_multi(jnp.asarray(img), kernels))
    assert ours.shape == (8, 33, 47)
    for s in range(8):
        ref = golden.sep_conv_clamp(img, kernels[s])
        np.testing.assert_allclose(ours[s], ref, rtol=1e-4, atol=1e-3)
