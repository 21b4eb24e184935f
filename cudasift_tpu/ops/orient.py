"""Orientation assignment — patch-resident gather-free histograms.

TPU-native replacement for ``ComputeOrientationsCONST``
(cudaSiftD.cu:972-1057). The CUDA kernel runs one 121-thread block per
keypoint doing bilinear texture taps and shared-memory atomicAdd histograms.
On TPU both patterns are poison (scalar gathers and scatters serialize), so:

1. one block-gather extracts a 16x16 patch per keypoint;
2. the 11x11 window's 484 bilinear taps become interpolation-matrix
   contractions against the patch (MXU);
3. the 32-bin histogram becomes a one-hot contraction (MXU) — no scatter.

Keypoints are processed in fixed-size blocks via ``lax.map`` to bound the
transient interpolation matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .texture import extract_patches, sample_patches_bilinear

NUM_BINS = 32
_PATCH = 16
_MARGIN = 7
_BLOCK = 256


def _pad_block(arrs, block):
    n = arrs[0].shape[0]
    pad = (-n) % block
    if pad:
        arrs = [jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) for a in arrs]
    return arrs, n + pad


def orientation_histograms(
    img: jnp.ndarray, xpos: jnp.ndarray, ypos: jnp.ndarray, scale: jnp.ndarray
) -> jnp.ndarray:
    """(N, 32) gradient-orientation histograms.

    11x11 window centered with offset -4.5 (cudaSiftD.cu:988-993), bilinear
    gradient taps at +-1, Gaussian weight with sigma = 1.5*scale
    (cudaSiftD.cu:982), bin = floor(16*atan2/3.1416 + 16.5) with >31 wrapping
    to 0 (cudaSiftD.cu:997-999).
    """
    (xp, yp, sc), padded_n = _pad_block([xpos, ypos, scale], _BLOCK)
    patches, oy, ox = extract_patches(img, xp, yp, _PATCH, _MARGIN)

    d = jnp.arange(11, dtype=jnp.float32)

    def block_fn(args):
        patches_b, xp_b, yp_b, sc_b, oy_b, ox_b = args
        # Window sample grid, local to each patch: (B, 11, 11).
        lx = (xp_b - 4.5 - ox_b.astype(jnp.float32))[:, None, None] + d[None, None, :]
        ly = (yp_b - 4.5 - oy_b.astype(jnp.float32))[:, None, None] + d[None, :, None]
        lx, ly = jnp.broadcast_arrays(lx, ly)
        b = lx.shape[0]
        s = 121
        lxf = lx.reshape(b, s)
        lyf = ly.reshape(b, s)
        # 4 taps per sample: x+-1, y+-1 — stacked into one sampling call.
        sx = jnp.concatenate([lxf + 1.0, lxf - 1.0, lxf, lxf], axis=1)
        sy = jnp.concatenate([lyf, lyf, lyf + 1.0, lyf - 1.0], axis=1)
        vals = sample_patches_bilinear(patches_b, sx, sy)  # (B, 4S)
        dx = vals[:, 0:s] - vals[:, s : 2 * s]
        dy = vals[:, 2 * s : 3 * s] - vals[:, 3 * s : 4 * s]
        bins = jnp.floor(16.0 * jnp.arctan2(dy, dx) / 3.1416 + 16.5).astype(jnp.int32)
        bins = jnp.where(bins > 31, 0, bins)
        i2sigma2 = -1.0 / (2.0 * 1.5 * 1.5 * sc_b * sc_b)
        g = jnp.exp(i2sigma2[:, None] * (d - 5.0) ** 2)  # (B, 11)
        weight = (
            jnp.sqrt(dx * dx + dy * dy).reshape(b, 11, 11)
            * g[:, :, None]
            * g[:, None, :]
        ).reshape(b, s)
        onehot = (bins[..., None] == jnp.arange(NUM_BINS, dtype=jnp.int32)).astype(
            weight.dtype
        )
        return jnp.einsum("bs,bsc->bc", weight, onehot, precision="highest")

    nb = padded_n // _BLOCK

    def reshape_b(a):
        return a.reshape((nb, _BLOCK) + a.shape[1:])

    hist = jax.lax.map(
        block_fn,
        (
            reshape_b(patches),
            reshape_b(xp),
            reshape_b(yp),
            reshape_b(sc),
            reshape_b(oy),
            reshape_b(ox),
        ),
    )
    return hist.reshape(padded_n, NUM_BINS)[: xpos.shape[0]]


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
    max1 = jnp.max(peaks, axis=1)
    cols = jnp.arange(peaks.shape[1], dtype=jnp.int32)
    masked = jnp.where(cols[None, :] == i1[:, None], -jnp.inf, peaks)
    i2 = jnp.argmax(masked, axis=1)
    max2 = jnp.max(masked, axis=1)

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
