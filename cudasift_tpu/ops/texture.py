"""Bilinear texture sampling — the TPU replacement for CUDA ``tex2D``.

The reference samples the octave base image through a texture object with
linear filtering, clamp addressing and unnormalized coordinates
(cudaSiftH.cu:187-205). CUDA's convention shifts coordinates by -0.5 before
interpolating; we reproduce that exactly (in full float precision, not the
hardware's 8-bit interpolation fractions — README.md:19 already treats small
deviations as acceptable).

Implemented as vectorized gathers: all callers pass whole coordinate arrays,
so XLA emits batched dynamic gathers rather than per-point loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tex2d(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` (H, W) at arbitrary float coordinate arrays.

    ``x`` / ``y`` follow CUDA's unnormalized texture convention: the texel
    centered at integer pixel (i, j) is sampled by (x, y) = (i+0.5, j+0.5).
    Returns an array of samples with the broadcast shape of x and y.
    """
    h, w = img.shape
    xb = jnp.clip(x - 0.5, 0.0, w - 1.0)
    yb = jnp.clip(y - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(xb)
    y0 = jnp.floor(yb)
    ax = xb - x0
    ay = yb - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    top = v00 + ax * (v01 - v00)
    bot = v10 + ax * (v11 - v10)
    return top + ay * (bot - top)


def extract_patches(
    img: jnp.ndarray,
    xpos: jnp.ndarray,
    ypos: jnp.ndarray,
    patch: int,
    margin: int,
):
    """Gather a (patch, patch) window around each keypoint.

    Returns (patches (N, patch, patch), oy (N,), ox (N,)) where (oy, ox) is
    each window's top-left corner, clamped inside the image. One XLA gather
    with 2-D slice sizes — the TPU-friendly replacement for per-texel
    ``tex2D`` gathers: every later sample reads the VMEM/register-resident
    patch instead of HBM.

    Requires ``patch >= 2*margin + 2``: with a clamped origin, every tap
    within ``margin`` of the keypoint stays inside the patch, so clamping
    sample coordinates to the patch boundary reproduces CUDA's clamp-to-edge
    addressing exactly (cudaSiftH.cu:198-200).
    """
    h, w = img.shape
    if h < patch or w < patch:
        # Tiny octave: edge-pad so a full patch always exists. Replicated
        # rows/cols equal what clamp-to-edge addressing would read anyway.
        img = jnp.pad(
            img, ((0, max(0, patch - h)), (0, max(0, patch - w))), mode="edge"
        )
        h, w = img.shape
    oy = jnp.clip(jnp.floor(ypos).astype(jnp.int32) - margin, 0, max(h - patch, 0))
    ox = jnp.clip(jnp.floor(xpos).astype(jnp.int32) - margin, 0, max(w - patch, 0))
    patches = jax.vmap(
        lambda y0, x0: jax.lax.dynamic_slice(img, (y0, x0), (patch, patch))
    )(oy, ox)
    return patches, oy, ox


def sample_patches_bilinear(
    patches: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear-sample each patch at local texture coordinates.

    patches: (B, P, P); x, y: (B, S) in CUDA tex2D convention *local to the
    patch* (i.e. global coord minus window origin). Returns (B, S).

    The interpolation is expressed as two interpolation-matrix contractions
    (one-hot rows/cols carrying the bilinear weights) so the whole sampling
    stage runs on the MXU — zero gathers.
    """
    p = patches.shape[-1]
    xb = jnp.clip(x - 0.5, 0.0, p - 1.0)
    yb = jnp.clip(y - 0.5, 0.0, p - 1.0)
    x0 = jnp.floor(xb)
    y0 = jnp.floor(yb)
    ax = (xb - x0)[..., None]
    ay = (yb - y0)[..., None]
    x0i = x0.astype(jnp.int32)[..., None]
    y0i = y0.astype(jnp.int32)[..., None]
    pidx = jnp.arange(p, dtype=jnp.int32)
    rows = (pidx == y0i) * (1.0 - ay) + (pidx == y0i + 1) * ay  # (B, S, P)
    cols = (pidx == x0i) * (1.0 - ax) + (pidx == x0i + 1) * ax  # (B, S, P)
    t = jnp.einsum("bsp,bpq->bsq", rows, patches, precision="highest")
    return jnp.einsum("bsq,bsq->bs", t, cols, precision="highest")


def fast_atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial atan2 approximation (FastAtan2, cudaSiftD.cu:295-306).

    Used by the descriptor stage both for parity with the reference and
    because it is a cheap VPU polynomial (no transcendental op). Max error
    ~0.005 rad.
    """
    absx = jnp.abs(x)
    absy = jnp.abs(y)
    mx = jnp.maximum(absx, absy)
    mn = jnp.minimum(absx, absy)
    a = mn / jnp.where(mx == 0.0, 1.0, mx)
    s = a * a
    r = ((-0.0464964749 * s + 0.15931422) * s - 0.327622764) * s * a + a
    r = jnp.where(absy > absx, 1.57079637 - r, r)
    r = jnp.where(x < 0, 3.14159274 - r, r)
    return jnp.where(y < 0, -r, r)
