"""Orientation assignment — vectorized gather + histogram.

TPU-native replacement for ``ComputeOrientationsCONST``
(cudaSiftD.cu:972-1057). The CUDA kernel runs one 121-thread block per
keypoint with shared-memory ``atomicAdd`` histograms; here every keypoint's
11x11 window is gathered at once through the bilinear sampler and the 32-bin
histograms are built with a single segment-sum (deterministic, no atomics).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import ops as jops

from .texture import tex2d

NUM_BINS = 32


def orientation_histograms(
    img: jnp.ndarray, xpos: jnp.ndarray, ypos: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """(N, 32) gradient-orientation histograms.

    11x11 window centered with offset -4.5 (cudaSiftD.cu:988-993), bilinear
    gradient taps at +-1, Gaussian weight with sigma = 1.5*scale
    (cudaSiftD.cu:982), bin = floor(16*atan2/3.1416 + 16.5) with >31 wrapping
    to 0 (cudaSiftD.cu:997-999).
    """
    n = xpos.shape[0]
    d = jnp.arange(11, dtype=jnp.float32)
    # Sample grids: (N, 11, 11) with y as axis 1, x as axis 2.
    xf = (xpos - 4.5)[:, None, None] + d[None, None, :]
    yf = (ypos - 4.5)[:, None, None] + d[None, :, None]
    dx = tex2d(img, xf + 1.0, yf) - tex2d(img, xf - 1.0, yf)
    dy = tex2d(img, xf, yf + 1.0) - tex2d(img, xf, yf - 1.0)
    bins = jnp.floor(16.0 * jnp.arctan2(dy, dx) / 3.1416 + 16.5).astype(jnp.int32)
    bins = jnp.where(bins > 31, 0, bins)
    i2sigma2 = -1.0 / (2.0 * 1.5 * 1.5 * scale * scale)
    g = jnp.exp(i2sigma2[:, None] * (d - 5.0) ** 2)  # (N, 11)
    weight = jnp.sqrt(dx * dx + dy * dy) * g[:, :, None] * g[:, None, :]
    seg = (jnp.arange(n, dtype=jnp.int32)[:, None, None] * NUM_BINS + bins).reshape(-1)
    hist = jops.segment_sum(weight.reshape(-1), seg, num_segments=n * NUM_BINS)
    return hist.reshape(n, NUM_BINS)


def histogram_peaks(hist: jnp.ndarray):
    """Smooth, find the top two local peaks, parabola-refine to degrees.

    Returns (primary_deg (N,), secondary_deg (N,), has_second (N,) bool).
    Smoothing kernel [1,4,6,4,1] circular (cudaSiftD.cu:1009); a bin is a
    peak if strictly above its left neighbor and >= its right neighbor
    (cudaSiftD.cu:1014); first-maximum tie-breaking matches the reference's
    ascending scan (cudaSiftD.cu:1022-1033).
    """
    sm = (
        6.0 * hist
        + 4.0 * (jnp.roll(hist, 1, axis=1) + jnp.roll(hist, -1, axis=1))
        + jnp.roll(hist, 2, axis=1)
        + jnp.roll(hist, -2, axis=1)
    )
    peaks = jnp.where(
        (sm > jnp.roll(sm, 1, axis=1)) & (sm >= jnp.roll(sm, -1, axis=1)), sm, 0.0
    )
    i1 = jnp.argmax(peaks, axis=1)
    max1 = jnp.take_along_axis(peaks, i1[:, None], axis=1)[:, 0]
    masked = peaks.at[jnp.arange(peaks.shape[0]), i1].set(-jnp.inf)
    i2 = jnp.argmax(masked, axis=1)
    max2 = jnp.take_along_axis(masked, i2[:, None], axis=1)[:, 0]

    def interp(i, m):
        v1 = jnp.take_along_axis(sm, ((i + 1) % 32)[:, None], axis=1)[:, 0]
        v2 = jnp.take_along_axis(sm, ((i - 1) % 32)[:, None], axis=1)[:, 0]
        denom = 2.0 * m - v1 - v2
        peak = i + 0.5 * (v1 - v2) / jnp.where(denom == 0.0, 1e-30, denom)
        return 11.25 * jnp.where(peak < 0.0, peak + 32.0, peak)

    return interp(i1, max1), interp(i2, max2), max2 > 0.8 * max1


def compute_orientations(
    img: jnp.ndarray, xpos: jnp.ndarray, ypos: jnp.ndarray, scale: jnp.ndarray
):
    """Primary/secondary orientations for a batch of keypoints."""
    hist = orientation_histograms(img, xpos, ypos, scale)
    return histogram_peaks(hist)
