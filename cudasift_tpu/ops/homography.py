"""RANSAC homography estimation and iterative least-squares refinement.

TPU-native replacement for ``FindHomography`` (matching.cu:1000-1087) and
``ImproveHomography`` (geomFuncs.cpp:6-72). The reference's path is the
chattiest in the codebase: device->host copies of scores, host ``rand()``
sampling, host->device index upload, two kernels, a host argmax and a pure
CPU refinement loop using OpenCV's Cholesky solver. Here the whole thing is
one jitted program: ``jax.random`` sampling, batched 8x8 DLT solves
(Gauss-Jordan replacing the per-thread LU ``InvertMatrix<8>``,
matching.cu:821-905), an MSAC-scored vote with an LO-RANSAC inlier refit,
and an iteratively reweighted refinement. All least-squares updates go
through a Hartley-normalized thin-QR solve (ops/linalg.weighted_lstsq8):
the reference can afford float64 normal equations on the host
(geomFuncs.cpp:17-55); in float32 they square the condition number and
lose the homography's perspective row, while QR keeps the error at
kappa(A)*eps and stays platform-stable. See ROADMAP.md for the documented
deviations from the reference's exact vote/refine semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sift_data import SiftData
from .linalg import solve_batched, weighted_lstsq8


def _compact_valid(mask: jnp.ndarray, capacity: int):
    """Indices of set bits, raster order, fixed capacity."""
    from .scan import mask_cumsum

    pos = mask_cumsum(mask) - 1
    count = jnp.minimum(pos[-1] + 1, capacity).astype(jnp.int32)
    dest = jnp.where(mask, pos, capacity)
    src = jnp.arange(mask.shape[0], dtype=jnp.int32)
    out = jnp.zeros((capacity,), jnp.int32).at[dest].set(src, mode="drop")
    return out, count


def _sample_distinct_quads(key, num_loops: int, num_valid: jnp.ndarray):
    """(num_loops, 4) distinct indices in [0, num_valid).

    Replaces the host rand() rejection loops (matching.cu:1041-1053) with a
    collision-increment scheme: after at most 3 passes of bumping colliding
    draws forward (mod n) every quad is distinct for n >= 8 (the caller
    guarantees num_valid >= 8, matching.cu:1040).
    """
    n = jnp.maximum(num_valid, 8)
    u = jax.random.uniform(key, (num_loops, 4))
    idx = jnp.floor(u * n).astype(jnp.int32) % n

    def fix(_, idx):
        a, b, c, d = idx[:, 0], idx[:, 1], idx[:, 2], idx[:, 3]
        b = (b + (b == a)) % n
        c = (c + (c == a)) % n
        c = (c + (c == b)) % n
        d = (d + (d == a)) % n
        d = (d + (d == b)) % n
        d = (d + (d == c)) % n
        return jnp.stack([a, b, c, d], axis=1)

    return jax.lax.fori_loop(0, 4, fix, idx)


def _dlt_batch(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Batched 8-parameter DLT (ComputeHomographies, matching.cu:907-948).

    src, dst: (L, 4, 2) -> (L, 8) homography rows [h00..h21], h22 = 1.
    """
    x1, y1 = src[..., 0], src[..., 1]
    x2, y2 = dst[..., 0], dst[..., 1]
    zeros = jnp.zeros_like(x1)
    ones = jnp.ones_like(x1)
    rows_a = jnp.stack(
        [x1, y1, ones, zeros, zeros, zeros, -x2 * x1, -x2 * y1], axis=-1
    )
    rows_b = jnp.stack(
        [zeros, zeros, zeros, x1, y1, ones, -y2 * x1, -y2 * y1], axis=-1
    )
    a = jnp.concatenate([rows_a, rows_b], axis=1)  # (L, 8, 8)
    b = jnp.concatenate([x2, y2], axis=1)  # (L, 8)
    return solve_batched(a, b)


def _inlier_counts(
    h8: jnp.ndarray, x1, y1, x2, y2, valid: jnp.ndarray, thresh: float
):
    """Inlier count + truncated-quadratic (MSAC) score per candidate.

    The count is the reference's division-free test (TestHomographies,
    matching.cu:969-981). The MSAC score sum(min(err^2, thresh^2)) breaks
    count ties toward the SHARP consensus: on repetitive scenes two rival
    homographies (true-instance and shifted-instance matches) can certify
    near-identical inlier counts at `thresh` while differing hugely in
    residual tightness (measured on data/left+righ at thresh 4.0: both
    ~1005 inliers at 5 px, but 868 vs 284 survivors at 3 px).
    """
    nomx = h8[:, 0:1] * x1 + h8[:, 1:2] * y1 + h8[:, 2:3]
    nomy = h8[:, 3:4] * x1 + h8[:, 4:5] * y1 + h8[:, 5:6]
    deno = h8[:, 6:7] * x1 + h8[:, 7:8] * y1 + 1.0
    t2 = thresh * thresh
    err2s = (x2 * deno - nomx) ** 2 + (y2 * deno - nomy) ** 2
    ok = (err2s < t2 * deno * deno) & valid[None, :]
    deno2 = jnp.maximum(deno * deno, 1e-12)
    err2 = jnp.minimum(err2s / deno2, t2)
    msac = jnp.sum(jnp.where(valid[None, :], err2, 0.0), axis=1)
    return jnp.sum(ok, axis=1), msac


def find_homography(
    data: SiftData,
    key: jax.Array,
    num_loops: int | None = None,
    min_score: float | None = None,
    max_ambiguity: float | None = None,
    thresh: float | None = None,
    params=None,
):
    """RANSAC over matched pairs. Returns (homography (3,3), num_matches ()).

    Candidate pairs are filtered by score/ambiguity (matching.cu:1034-1037);
    inliers are counted over *all* matched points, like the reference's
    TestHomographies does. With fewer than 8 valid pairs the identity is
    returned with zero matches (matching.cu:1016,1040).

    ``params`` (a ``config.HomographyParams``) supplies the defaults for the
    scalar knobs; explicit keyword arguments win.
    """
    from ..config import HomographyParams

    p = params if params is not None else HomographyParams()
    num_loops = p.num_loops if num_loops is None else num_loops
    min_score = p.min_score if min_score is None else min_score
    max_ambiguity = p.max_ambiguity if max_ambiguity is None else max_ambiguity
    thresh = p.thresh if thresh is None else thresh
    cap = data.max_pts
    valid_pts = data.valid_mask()
    good = valid_pts & (data.score > min_score) & (data.ambiguity < max_ambiguity)
    good_idx, num_good = _compact_valid(good, cap)

    quads = _sample_distinct_quads(key, num_loops, num_good)  # (L, 4)
    pick = good_idx[quads]  # (L, 4) indices into point arrays

    # Hartley-normalize coordinates so the f32 DLT systems are
    # well-conditioned (the reference solves raw pixel systems in f32 too,
    # matching.cu:907-948, but tolerates the conditioning loss; on TPU we
    # normalize and denormalize the winning homography instead).
    cx1, cy1, s1 = _normalization(data.xpos, data.ypos, good)
    cx2, cy2, s2 = _normalization(data.match_xpos, data.match_ypos, good)
    nsx = s1 * (data.xpos[pick] - cx1)
    nsy = s1 * (data.ypos[pick] - cy1)
    ndx = s2 * (data.match_xpos[pick] - cx2)
    ndy = s2 * (data.match_ypos[pick] - cy2)
    src = jnp.stack([nsx, nsy], axis=-1)
    dst = jnp.stack([ndx, ndy], axis=-1)
    hn8 = _dlt_batch(src, dst)
    hn8 = jnp.where(jnp.isfinite(hn8), hn8, 0.0)
    # Denormalize each candidate: H = T2^-1 Hn T1, rescaled to h22 = 1.
    hn = jnp.concatenate(
        [hn8, jnp.ones((hn8.shape[0], 1), hn8.dtype)], axis=1
    ).reshape(-1, 3, 3)
    t1 = jnp.array([[s1, 0, -s1 * cx1], [0, s1, -s1 * cy1], [0, 0, 1]], jnp.float32)
    t2inv = jnp.array([[1 / s2, 0, cx2], [0, 1 / s2, cy2], [0, 0, 1]], jnp.float32)
    hp = jnp.einsum("ij,ljk,km->lim", t2inv, hn, t1)
    h22 = hp[:, 2, 2]
    h22 = jnp.where(jnp.abs(h22) < 1e-12, 1e-12, h22)
    hp = hp / h22[:, None, None]
    h8 = hp.reshape(-1, 9)[:, :8]
    h8 = jnp.where(jnp.isfinite(h8), h8, 0.0)

    counts, msac = _inlier_counts(
        h8, data.xpos[None, :], data.ypos[None, :],
        data.match_xpos[None, :], data.match_ypos[None, :],
        valid_pts, thresh,
    )
    best = jnp.argmin(msac)
    best_h8 = h8[best]
    num_matches = counts[best]

    # Locally-optimized refit (LO-RANSAC): re-solve the winner on its OWN
    # inlier set — ALL valid matches within `thresh`, not just the
    # score/ambiguity-gated candidates the quads were drawn from. The
    # reference returns the raw 4-point DLT winner (matching.cu:1067-1075)
    # and relies on ImproveHomography's gated IRLS to polish it; on
    # repetitive scenes the ratio test passes only tens of pairs, far too
    # few for that polish to pin the perspective row. Refitting on the
    # vote's global consensus set (~1000 pairs on the bundled pair) is
    # support the reference's own TestHomographies already certifies.
    # Documented deviation (ROADMAP.md).
    def lo_refit(h8_cur, _):
        hcur = jnp.concatenate(
            [h8_cur, jnp.ones((1,), h8_cur.dtype)]).reshape(3, 3)
        den = hcur[2, 0] * data.xpos + hcur[2, 1] * data.ypos + 1.0
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        px = (hcur[0, 0] * data.xpos + hcur[0, 1] * data.ypos + hcur[0, 2]) / den
        py = (hcur[1, 0] * data.xpos + hcur[1, 1] * data.ypos + hcur[1, 2]) / den
        err2 = (px - data.match_xpos) ** 2 + (py - data.match_ypos) ** 2
        w = (valid_pts & (err2 < thresh * thresh)).astype(jnp.float32)
        ix1, iy1 = s1 * (data.xpos - cx1), s1 * (data.ypos - cy1)
        ix2 = s2 * (data.match_xpos - cx2)
        iy2 = s2 * (data.match_ypos - cy2)
        ones = jnp.ones_like(ix1)
        zeros = jnp.zeros_like(ix1)
        ya = jnp.stack(
            [ix1, iy1, ones, zeros, zeros, zeros, -ix1 * ix2, -iy1 * ix2], 1)
        yb = jnp.stack(
            [zeros, zeros, zeros, ix1, iy1, ones, -ix1 * iy2, -iy1 * iy2], 1)
        # Thin-QR weighted least squares (see ops/linalg.weighted_lstsq8):
        # f32 normal equations lose the perspective row at this support.
        a, ok = weighted_lstsq8(ya, yb, w, ix2, iy2)
        hn = jnp.concatenate([a, jnp.ones((1,), a.dtype)]).reshape(3, 3)
        hr = t2inv @ hn @ t1
        h22r = jnp.where(jnp.abs(hr[2, 2]) < 1e-12, 1e-12, hr[2, 2])
        hr8 = (hr / h22r).reshape(9)[:8]
        ok = ok & jnp.all(jnp.isfinite(hr8))
        return jnp.where(ok, hr8, h8_cur), None

    refit_h8, _ = jax.lax.scan(lo_refit, best_h8, None, length=4)
    refit_counts, refit_msac = _inlier_counts(
        refit_h8[None], data.xpos[None, :], data.ypos[None, :],
        data.match_xpos[None, :], data.match_ypos[None, :],
        valid_pts, thresh,
    )
    # Keep whichever model scores better (standard LO-RANSAC).
    better = refit_msac[0] <= msac[best]
    best_h8 = jnp.where(better, refit_h8, best_h8)
    num_matches = jnp.where(better, refit_counts[0], num_matches)

    enough = num_good >= 8
    identity = jnp.array([1.0, 0, 0, 0, 1.0, 0, 0, 0], jnp.float32)
    best_h8 = jnp.where(enough, best_h8, identity)
    num_matches = jnp.where(enough, num_matches, 0)
    homography = jnp.concatenate([best_h8, jnp.ones((1,), best_h8.dtype)]).reshape(3, 3)
    return homography, num_matches


def _normalization(x, y, mask):
    """Hartley similarity transform: zero mean, mean distance sqrt(2)."""
    w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    cx = (x * w).sum() / n
    cy = (y * w).sum() / n
    d = jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2)
    mean_d = (d * w).sum() / n
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-6)
    return cx, cy, s


def improve_homography(
    data: SiftData,
    homography: jnp.ndarray,
    num_loops: int = 5,
    min_score: float = 0.0,
    max_ambiguity: float = 0.95,
    thresh: float = 3.0,
):
    """Iteratively reweighted DLT refinement (ImproveHomography,
    geomFuncs.cpp:6-72).

    Each iteration: binary weights err < thresh^2 on score/ambiguity-filtered
    pairs, accumulate the 8x8 normal equations, solve. Coordinates are
    Hartley-normalized so f32 accumulation is stable; the solved homography
    is denormalized before the next weighting pass, keeping the iteration
    equivalent to the reference's pixel-space loop.

    Returns (homography (3,3), num_fit (), match_error (max_pts,)).
    """
    limit = thresh * thresh
    valid = data.valid_mask()
    gated = valid & (data.score >= min_score) & (data.ambiguity <= max_ambiguity)
    x1, y1 = data.xpos, data.ypos
    x2, y2 = data.match_xpos, data.match_ypos

    cx1, cy1, s1 = _normalization(x1, y1, gated)
    cx2, cy2, s2 = _normalization(x2, y2, gated)
    nx1, ny1 = s1 * (x1 - cx1), s1 * (y1 - cy1)
    nx2, ny2 = s2 * (x2 - cx2), s2 * (y2 - cy2)

    t1 = jnp.array(
        [[s1, 0, -s1 * cx1], [0, s1, -s1 * cy1], [0, 0, 1]], jnp.float32
    )
    t2 = jnp.array(
        [[s2, 0, -s2 * cx2], [0, s2, -s2 * cy2], [0, 0, 1]], jnp.float32
    )
    t2inv = jnp.array(
        [[1 / s2, 0, cx2], [0, 1 / s2, cy2], [0, 0, 1]], jnp.float32
    )

    ones = jnp.ones_like(nx1)
    zeros = jnp.zeros_like(nx1)
    ya = jnp.stack([nx1, ny1, ones, zeros, zeros, zeros, -nx1 * nx2, -ny1 * nx2], 1)
    yb = jnp.stack([zeros, zeros, zeros, nx1, ny1, ones, -nx1 * ny2, -ny1 * ny2], 1)

    def errors(h):
        """Squared reprojection error in original pixel space."""
        den = h[2, 0] * x1 + h[2, 1] * y1 + h[2, 2]
        den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
        px = (h[0, 0] * x1 + h[0, 1] * y1 + h[0, 2]) / den
        py = (h[1, 0] * x1 + h[1, 1] * y1 + h[1, 2]) / den
        return (px - x2) ** 2 + (py - y2) ** 2

    def solve_weighted(w):
        """One weighted least-squares update -> denormalized homography.

        Thin-QR instead of the reference's float64 normal equations
        (geomFuncs.cpp:17-55): in f32 the normal equations square the
        condition number and lose the perspective row (ops/linalg.py).
        """
        a, ok = weighted_lstsq8(ya, yb, w, nx2, ny2)
        hn = jnp.concatenate([a, jnp.ones((1,), a.dtype)]).reshape(3, 3)
        h_new = t2inv @ hn @ t1
        h22 = jnp.where(jnp.abs(h_new[2, 2]) < 1e-12, 1e-12, h_new[2, 2])
        h_new = h_new / h22
        ok = ok & jnp.all(jnp.isfinite(h_new))
        return h_new, ok

    def body(_, h):
        err = errors(h)
        # The reference's update: gated (score/ambiguity-filtered) support.
        # An 8-parameter solve needs >= 4 correspondences (8 equations);
        # with fewer the normal equations are singular — keep the current
        # homography instead of collapsing (the reference feeds the same
        # near-empty systems to cv::solve and gets garbage back).
        w_gated = (gated & (err < limit)).astype(jnp.float32)
        h_gated, ok_gated = solve_weighted(w_gated)
        # Fallback supports: the current global consensus at `limit`, and a
        # 2x-radius annealing support that pulls in straggler inliers the
        # current homography leaves just outside `limit`. With only tens of
        # gated pairs (the ratio test on repetitive scenes) the f32 solve
        # under-determines the perspective row and extrapolates badly — the
        # reference is only safe here because cv::solve runs in float64
        # (geomFuncs.cpp:17-55). Documented deviation (ROADMAP.md).
        w_glob = (valid & (err < limit)).astype(jnp.float32)
        h_glob, ok_glob = solve_weighted(w_glob)
        w_wide = (valid & (err < 4.0 * limit)).astype(jnp.float32)
        h_wide, ok_wide = solve_weighted(w_wide)

        # Selection criterion: truncated-quadratic (MSAC) score at a TIGHTER
        # sub-threshold (0.75 * thresh, squared), over all valid pairs.
        # Deliberately NOT the reported numFit (err < thresh count): an
        # estimator that selects by its own scoreboard can inflate the
        # metric without improving the model (r2/r3 review finding). MSAC
        # at the sub-threshold prefers the tight consensus that a raw count
        # cannot separate on repetitive scenes, and is the same family of
        # criterion find_homography's vote already uses. Failed solves
        # score +inf; ties keep the reference's gated update first.
        sub = 0.5625 * limit
        def msac(e):
            return jnp.sum(jnp.where(valid, jnp.minimum(e, sub), 0.0))

        m_cur = msac(err)
        m_gated = jnp.where(ok_gated, msac(errors(h_gated)), jnp.inf)
        m_glob = jnp.where(ok_glob, msac(errors(h_glob)), jnp.inf)
        m_wide = jnp.where(ok_wide, msac(errors(h_wide)), jnp.inf)
        best = jnp.minimum(
            m_cur, jnp.minimum(m_gated, jnp.minimum(m_glob, m_wide))
        )
        h_out = jnp.where(
            m_gated == best, h_gated,
            jnp.where(m_glob == best, h_glob,
                      jnp.where(m_wide == best, h_wide, h)),
        )
        return h_out

    h = homography / homography[2, 2]
    h = jax.lax.fori_loop(0, num_loops, body, h)

    err = errors(h)
    match_error = jnp.sqrt(jnp.where(valid, err, 0.0))
    num_fit = jnp.sum(valid & (err < limit))
    return h, num_fit, match_error
