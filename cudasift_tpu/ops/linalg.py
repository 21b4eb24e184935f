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


def weighted_lstsq8(ya, yb, w, bx, by):
    """Weighted least squares for the 8-parameter DLT rows, via thin QR.

    Solves min over a of ||sqrt(w) (Y a - b)|| where Y stacks ``ya`` and
    ``yb`` (each (n, 8)) and b stacks ``bx``/``by``. The reference forms
    the normal equations and Cholesky-solves them in float64
    (geomFuncs.cpp:17-55); in float32 that squares the condition number and
    loses the perspective row. Modified Gram-Schmidt with
    re-orthogonalization keeps the error at kappa(A)*eps_f32 — adequate for
    Hartley-normalized designs — using only dots/axpys XLA runs well on
    any backend. Returns (a (8,), ok) where ok requires >= 4 weighted rows
    and a numerically nonsingular R.
    """
    sw = jnp.sqrt(w)
    a_mat = jnp.concatenate([ya * sw[:, None], yb * sw[:, None]], axis=0)
    b = jnp.concatenate([sw * bx, sw * by], axis=0)

    n8 = 8
    qs = []
    r = jnp.zeros((n8, n8), jnp.float32)
    qtb = jnp.zeros((n8,), jnp.float32)
    ok = jnp.sum(w) >= 4.0
    for j in range(n8):
        v = a_mat[:, j]
        for _pass in range(2):  # MGS with re-orthogonalization
            for i in range(j):
                cij = jnp.sum(qs[i] * v)
                r = r.at[i, j].add(cij)
                v = v - cij * qs[i]
        nj = jnp.sqrt(jnp.sum(v * v))
        ok = ok & (nj > 1e-12)
        nj_safe = jnp.maximum(nj, 1e-30)
        q = v / nj_safe
        r = r.at[j, j].set(nj)
        qtb = qtb.at[j].set(jnp.sum(q * b))
        qs.append(q)

    # Back substitution on the 8x8 upper-triangular R.
    a = jnp.zeros((n8,), jnp.float32)
    for j in range(n8 - 1, -1, -1):
        s = qtb[j] - jnp.sum(r[j, j + 1 :] * a[j + 1 :])
        a = a.at[j].set(s / jnp.maximum(r[j, j], 1e-30))
    ok = ok & jnp.all(jnp.isfinite(a))
    return a, ok
