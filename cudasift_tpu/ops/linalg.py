"""Small batched dense solves, hand-rolled for TPU.

The reference solves its 8x8 DLT systems with a per-thread LU inversion
(``InvertMatrix<8>``, matching.cu:821-905) and its refinement systems with
OpenCV's Cholesky on the host (geomFuncs.cpp:55). On TPU, XLA's generic
``jnp.linalg.solve`` lowers tiny batched systems through a LAPACK-style path
that compiles pathologically slowly on this backend (minutes) and serializes
poorly; an unrolled Gauss-Jordan elimination with partial pivoting is pure
VPU arithmetic — 8 static steps of select/broadcast/FMA over the batch — and
compiles in milliseconds.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_batched(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a[i] @ x[i] = b[i] for small static n via Gauss-Jordan.

    a: (..., n, n), b: (..., n). Partial pivoting by |column| argmax keeps
    the elimination stable for the (occasionally near-singular) RANSAC DLT
    systems; singular systems yield inf/nan which callers mask out, matching
    the reference's behavior of letting degenerate samples lose the inlier
    vote (matching.cu:872-873 clamps the pivot instead).
    """
    n = a.shape[-1]
    aug = jnp.concatenate([a, b[..., None]], axis=-1)  # (..., n, n+1)
    for k in range(n):
        col = jnp.abs(aug[..., :, k])
        # Mask rows above the current pivot row.
        row_idx = jnp.arange(n)
        col = jnp.where(row_idx >= k, col, -jnp.inf)
        piv = jnp.argmax(col, axis=-1)  # (...,)
        pivot_row = jnp.take_along_axis(
            aug, piv[..., None, None].astype(jnp.int32), axis=-2
        )  # (..., 1, n+1)
        # Swap row k with the pivot row.
        k_row = aug[..., k : k + 1, :]
        onehot_piv = (row_idx[:, None] == piv[..., None, None]).astype(aug.dtype)
        onehot_k = (row_idx[:, None] == k).astype(aug.dtype)
        aug = (
            aug
            + onehot_k[..., :, :] * (pivot_row - k_row)
            + onehot_piv[..., :, :] * (k_row - pivot_row)
        )
        # Eliminate column k from every other row.
        pivot = aug[..., k : k + 1, k : k + 1]
        pivot = jnp.where(jnp.abs(pivot) < 1e-30, 1e-30, pivot)
        factors = aug[..., :, k : k + 1] / pivot  # (..., n, 1)
        factors = jnp.where(row_idx[:, None] == k, 0.0, factors)
        aug = aug - factors * aug[..., k : k + 1, :]
        # Normalize the pivot row.
        aug = aug.at[..., k, :].set(aug[..., k, :] / pivot[..., 0, :])
    return aug[..., :, n]
