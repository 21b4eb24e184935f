"""128-D SIFT descriptor extraction — dense, matmul-shaped binning.

TPU-native replacement for ``ExtractSiftDescriptorsCONSTNew``
(cudaSiftD.cu:308-417). The CUDA kernel scatters 8 shared-memory atomicAdds
per sample into a 128-bin histogram. Here the trilinear soft-binning is
*decomposed into separable contractions*:

- the spatial (4x4 cell) weights depend only on the static sample index, so
  they become two constant (16, 4) matrices contracted on the MXU;
- the angular (8 bin) weights become a dense per-sample 8-vector built from
  comparisons (no scatter at all).

desc[n, r, c, b] = sum_{y,tx} Wr[y, r] * Wc[tx, c] * A[n, y, tx, b]

This removes every atomic/scatter from the reference's hottest per-keypoint
stage and turns it into VPU elementwise work plus two small matmuls.

The reference's boundary gates (tx>=2, tx<=13, ... cudaSiftD.cu:361-386) are
exactly "spatial bin index within [0, 3]" and are encoded in the zeros of the
constant matrices.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .texture import tex2d, fast_atan2


def _spatial_bin_matrix() -> np.ndarray:
    """(16, 4) trilinear spatial weights: W[i, cell].

    Mirrors hori = (i+2)//4 - 1, horf = (i-1.5)/4 - hori (cudaSiftD.cu:347-352):
    sample i contributes (1-horf) to cell hori and horf to cell hori+1, with
    out-of-range cells dropped.
    """
    w = np.zeros((16, 4), np.float32)
    for i in range(16):
        cell = (i + 2) // 4 - 1
        frac = (i - 1.5) / 4.0 - cell
        if 0 <= cell <= 3:
            w[i, cell] = 1.0 - frac
        if 0 <= cell + 1 <= 3:
            w[i, cell + 1] = frac
    return w


_W_SPATIAL = _spatial_bin_matrix()
_GAUSS16 = np.exp(-((np.arange(16) - 7.5) ** 2) / 128.0).astype(np.float32)


def extract_descriptors(
    img: jnp.ndarray,
    xpos: jnp.ndarray,
    ypos: jnp.ndarray,
    scale: jnp.ndarray,
    orientation: jnp.ndarray,
) -> jnp.ndarray:
    """(N, 128) descriptors for a batch of oriented keypoints.

    Geometry per cudaSiftD.cu:330-343: 16x16 grid rotated by the keypoint
    orientation, spacing (12/16)*scale, the deliberate +0.5 sample shift, and
    unit-length rotated gradient taps. Normalization per cudaSiftD.cu:390-409:
    L2 -> clamp 0.2 -> L2.
    """
    n = xpos.shape[0]
    theta = (2.0 * 3.1415 / 360.0) * orientation
    sina = jnp.sin(theta)
    cosa = jnp.cos(theta)
    sc = (12.0 / 16.0) * scale
    ssina = (sc * sina)[:, None, None]
    scosa = (sc * cosa)[:, None, None]
    sina_ = sina[:, None, None]
    cosa_ = cosa[:, None, None]

    i = jnp.arange(16, dtype=jnp.float32) - 7.5
    gx = i[None, None, :]  # tx offset
    gy = i[None, :, None]  # y offset
    xs = xpos[:, None, None] + gx * scosa - gy * ssina + 0.5
    ys = ypos[:, None, None] + gx * ssina + gy * scosa + 0.5

    dx = tex2d(img, xs + cosa_, ys + sina_) - tex2d(img, xs - cosa_, ys - sina_)
    dy = tex2d(img, xs - sina_, ys + cosa_) - tex2d(img, xs + sina_, ys - cosa_)

    g = jnp.asarray(_GAUSS16)
    grad = g[None, :, None] * g[None, None, :] * jnp.sqrt(dx * dx + dy * dy)
    angf = 4.0 / 3.1415 * fast_atan2(dy, dx) + 4.0
    angi_raw = jnp.floor(angf)
    frac = angf - angi_raw
    angi = angi_raw.astype(jnp.int32) % 8  # wrap the angf==8 corner case
    angp = (angi + 1) % 8

    bins8 = jnp.arange(8, dtype=jnp.int32)
    onehot_a = (angi[..., None] == bins8).astype(grad.dtype)
    onehot_p = (angp[..., None] == bins8).astype(grad.dtype)
    # (N, 16, 16, 8) angular contribution per sample.
    ang = grad[..., None] * ((1.0 - frac)[..., None] * onehot_a + frac[..., None] * onehot_p)

    w = jnp.asarray(_W_SPATIAL)
    # Contract sample rows -> cell rows, then sample cols -> cell cols (MXU).
    t = jnp.einsum("yr,nyxb->nrxb", w, ang, precision="highest")
    desc = jnp.einsum("xc,nrxb->nrcb", w, t, precision="highest").reshape(n, 128)

    norm1 = jnp.sqrt(jnp.sum(desc * desc, axis=1, keepdims=True))
    t1 = jnp.minimum(desc / jnp.maximum(norm1, 1e-30), 0.2)
    norm2 = jnp.sqrt(jnp.sum(t1 * t1, axis=1, keepdims=True))
    return t1 / jnp.maximum(norm2, 1e-30)
