"""Separable Gaussian convolutions and resampling, XLA-native.

TPU-first reimplementation of the reference's preprocessing kernels:

- ``low_pass``   — 9-tap separable Gaussian prefilter
  (LowPassBlock, cudaSiftD.cu:1986-2037; host cudaSiftH.cu:406-435)
- ``scale_down`` — 5-tap Gaussian blur + 2x decimation
  (ScaleDown, cudaSiftD.cu:84-168; host cudaSiftH.cu:308-338)
- ``scale_up``   — 2x top-left-aligned bilinear upsample
  (ScaleUp, cudaSiftD.cu:170-190)
- ``blur_multi`` — one vertical+horizontal pass producing all 8 Gaussian
  scales of an octave (the blur half of LaplaceMultiMem,
  cudaSiftD.cu:1753-1793)

Rather than translating the CUDA shared-memory pipelines, each convolution is
expressed as a small unrolled sum of shifted slices over an edge-padded
array — a form XLA fuses into a single vectorized loop over VPU lanes. Edge
handling is clamp-to-edge everywhere, matching the reference's clamped loads.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _band_matrix(n_in: int, n_out: int, taps: tuple, stride: int) -> np.ndarray:
    """(n_in, n_out) clamp-to-edge banded convolution(+decimation) matrix.

    out[o] = sum_j taps[j] * in[clamp(stride*o + j - r)]. Dense but tiny
    relative to the image; turns stride-2 decimation and edge clamping into a
    single MXU matmul — strided lane slicing forces layout changes on TPU,
    a matmul does not.
    """
    r = (len(taps) - 1) // 2
    m = np.zeros((n_in, n_out), np.float32)
    for o in range(n_out):
        for j, t in enumerate(taps):
            src = min(max(stride * o + j - r, 0), n_in - 1)
            m[src, o] += t
    return m


def _conv_matmul(img: jnp.ndarray, taps, out_h: int, out_w: int,
                 stride: int) -> jnp.ndarray:
    """Separable conv(+decimation) as two banded matmuls: Dv.T @ img @ Dh."""
    h, w = img.shape
    taps_t = tuple(float(t) for t in taps)
    dv = jnp.asarray(_band_matrix(h, out_h, taps_t, stride))
    dh = jnp.asarray(_band_matrix(w, out_w, taps_t, stride))
    tmp = jnp.einsum("ho,hw->ow", dv, img, precision="highest")
    return jnp.einsum("ow,wx->ox", tmp, dh, precision="highest")


def _conv1d_v(padded: jnp.ndarray, taps: np.ndarray, out_rows: int) -> jnp.ndarray:
    """Vertical 1-D convolution of an already edge-padded (rows) array."""
    r = (len(taps) - 1) // 2
    acc = taps[0] * padded[0:out_rows]
    for j in range(1, 2 * r + 1):
        acc = acc + taps[j] * padded[j : j + out_rows]
    return acc


def _conv1d_h(padded: jnp.ndarray, taps: np.ndarray, out_cols: int) -> jnp.ndarray:
    """Horizontal 1-D convolution of an already edge-padded (cols) array."""
    r = (len(taps) - 1) // 2
    acc = taps[0] * padded[..., 0:out_cols]
    for j in range(1, 2 * r + 1):
        acc = acc + taps[j] * padded[..., j : j + out_cols]
    return acc


def sep_conv_clamp(img: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Separable symmetric convolution with clamp-to-edge, vertical then
    horizontal, same output shape. ``taps`` is a static numpy vector."""
    r = (len(taps) - 1) // 2
    h, w = img.shape
    pv = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    tmp = _conv1d_v(pv, taps, h)
    ph = jnp.pad(tmp, ((0, 0), (r, r)), mode="edge")
    return _conv1d_h(ph, taps, w)


def low_pass(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """9-tap Gaussian prefilter at sigma = max(initBlur, 0.001)
    (cudaSiftH.cu:112,406-421).

    Runs as unrolled weighted slice-sums (two VPU passes, ~0.14 GFLOP at
    1080p), not the banded-matmul form: at stride 1 there is no decimation
    to fold into a matmul, and the dense (H, H)/(W, W) band matrices cost
    ~12 GFLOP of HIGHEST-precision MXU work for the same result.
    """
    from ..config import gaussian_kernel_1d

    taps = gaussian_kernel_1d(4, float(sigma) * float(sigma))
    return sep_conv_clamp(img, taps)


def scale_down(img: jnp.ndarray, variance: float = 0.5) -> jnp.ndarray:
    """5-tap Gaussian blur + 2x decimation (cudaSiftD.cu:84-168).

    out[y, x] = sum_ij k[i] k[j] img[clamp(2y+j-2), clamp(2x+i-2)].
    Blur runs at full resolution then strides; XLA folds the stride into the
    final pass so no full-res intermediate is materialized for the horizontal
    stage.
    """
    from ..config import gaussian_kernel_1d

    taps = gaussian_kernel_1d(2, float(variance))
    h, w = img.shape
    return _conv_matmul(img, taps, h // 2, w // 2, 2)


def scale_up(img: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, top-left aligned (cudaSiftD.cu:170-190).

    out[2y,2x] = in[y,x]; right/down neighbors averaged with edge clamping.
    Expressed as four shifted views interleaved via stack+reshape.
    """
    h, w = img.shape
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:, :], img[-1:, :]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    top = jnp.stack([img, 0.5 * (img + right)], axis=2).reshape(h, 2 * w)
    bot = jnp.stack(
        [0.5 * (img + down), 0.25 * (img + right + down + down_right)], axis=2
    ).reshape(h, 2 * w)
    return jnp.stack([top, bot], axis=1).reshape(2 * h, 2 * w)


def blur_multi(img: jnp.ndarray, kernels: np.ndarray) -> jnp.ndarray:
    """All 8 Gaussian scales of one octave in one shot.

    ``kernels`` is the static (8, 9) tap table for this octave
    (PrepareLaplaceKernels, cudaSiftH.cu:439-458). Returns (8, H, W).
    The vertical pass contracts the 9-tap window against all 8 kernels at
    once; the horizontal pass then blurs each scale with its own taps.
    """
    r = 4
    h, w = img.shape
    pv = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    # Unrolled weighted slice-sums: 9 shifted adds per pass, broadcast over
    # the scale axis. XLA fuses each pass into one VPU loop; no matmul-shaped
    # contraction (a (8,9) tensordot lowers to a badly-tiled MXU op on TPU).
    vert = kernels[:, 0, None, None] * pv[None, 0:h]
    for j in range(1, 2 * r + 1):
        vert = vert + kernels[:, j, None, None] * pv[None, j : j + h]
    ph = jnp.pad(vert, ((0, 0), (0, 0), (r, r)), mode="edge")
    acc = kernels[:, 0, None, None] * ph[:, :, 0:w]
    for j in range(1, 2 * r + 1):
        acc = acc + kernels[:, j, None, None] * ph[:, :, j : j + w]
    return acc
