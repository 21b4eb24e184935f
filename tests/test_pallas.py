"""Pallas kernels vs their XLA twins (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import golden
from cudasift_tpu.ops.descriptor import extract_descriptors
from cudasift_tpu.ops.orient import orientation_histograms, histogram_peaks
from cudasift_tpu.ops.pallas.descriptor import extract_descriptors_pallas
from cudasift_tpu.ops.pallas.orient import orientation_histograms_pallas


def make_image(rng, h=96, w=160):
    img = (rng.standard_normal((h, w)) * 30 + 120).astype(np.float32)
    return golden.sep_conv_clamp(img, golden.gaussian_kernel(2, 1.0)).astype(
        np.float32
    )


def test_descriptor_kernel_matches_xla(rng):
    img = make_image(rng)
    n = 16
    xp = jnp.asarray(rng.uniform(5, 150, n).astype(np.float32))
    yp = jnp.asarray(rng.uniform(5, 90, n).astype(np.float32))
    sc = jnp.asarray(rng.uniform(0.95, 1.87, n).astype(np.float32))
    ori = jnp.asarray(rng.uniform(0, 360, n).astype(np.float32))
    ours = np.asarray(
        extract_descriptors_pallas(jnp.asarray(img), xp, yp, sc, ori, interpret=True)
    )
    ref = np.asarray(extract_descriptors(jnp.asarray(img), xp, yp, sc, ori))
    assert ours.shape == (n, 128)
    np.testing.assert_allclose(
        np.linalg.norm(ours, axis=1), 1.0, atol=1e-4
    )
    # bf16 MXU sampling with mean-centered patches: ~1e-3 descriptor error.
    err = np.abs(ours - ref).max(axis=1)
    assert np.median(err) < 4e-3, err
    assert err.max() < 2e-2, err


def test_orientation_kernel_matches_xla(rng):
    img = make_image(rng)
    n = 16
    xp = jnp.asarray(rng.uniform(5, 150, n).astype(np.float32))
    yp = jnp.asarray(rng.uniform(5, 90, n).astype(np.float32))
    sc = jnp.asarray(rng.uniform(0.95, 1.87, n).astype(np.float32))
    ours = np.asarray(
        orientation_histograms_pallas(jnp.asarray(img), xp, yp, sc, interpret=True)
    )
    ref = np.asarray(orientation_histograms(jnp.asarray(img), xp, yp, sc))
    assert ours.shape == (n, 32)
    # bf16 sampling can flip individual boundary samples between adjacent
    # bins; the histograms must still be close in aggregate and the final
    # peak orientations must agree (smoothing absorbs boundary flips).
    for i in range(n):
        c = np.corrcoef(ours[i], ref[i])[0, 1]
        assert c > 0.995, (i, c)
    p1, _, h1 = histogram_peaks(jnp.asarray(ours))
    p2, _, h2 = histogram_peaks(jnp.asarray(ref))
    d = np.abs(np.asarray(p1) - np.asarray(p2))
    d = np.minimum(d, 360.0 - d)
    assert np.median(d) < 0.2 and (d < 2.0).mean() >= 0.9, d


def test_descriptor_kernel_vs_golden_direct(rng):
    img = make_image(rng)
    pts = [(22.4, 28.1, 1.3, 45.0), (83.0, 50.0, 1.8, 190.5)]
    xp = jnp.asarray([p[0] for p in pts])
    yp = jnp.asarray([p[1] for p in pts])
    sc = jnp.asarray([p[2] for p in pts])
    ori = jnp.asarray([p[3] for p in pts])
    ours = np.asarray(
        extract_descriptors_pallas(jnp.asarray(img), xp, yp, sc, ori, interpret=True)
    )
    for i, (x, y, s, o) in enumerate(pts):
        ref = golden.extract_descriptor(img, x, y, s, o)
        assert np.abs(ours[i] - ref).max() < 5e-3


def test_match_kernel_matches_golden(rng):
    from cudasift_tpu.ops.pallas.match import match_descriptors_pallas
    import jax

    d1 = rng.standard_normal((300, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = rng.standard_normal((500, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    n1, n2 = 300, 443
    best, amb, idx = match_descriptors_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.int32(n1), jnp.int32(n2),
        interpret=True,
    )
    gb, ga, gi = golden.match_brute_force(
        d1[:n1].astype(np.float64), d2[:n2].astype(np.float64)
    )
    np.testing.assert_array_equal(np.asarray(idx)[:n1], gi)
    np.testing.assert_allclose(np.asarray(best)[:n1], gb, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(amb)[:n1], ga, rtol=1e-4, atol=1e-5)


def test_match_kernel_highest_tier_matches_golden(rng):
    """The single-pass Precision.HIGHEST tier (rescore_k=None) stays exact."""
    from cudasift_tpu.ops.pallas.match import match_descriptors_pallas

    d1 = rng.standard_normal((256, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = rng.standard_normal((400, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    n1, n2 = 256, 380
    best, amb, idx = match_descriptors_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.int32(n1), jnp.int32(n2),
        rescore_k=None, interpret=True,
    )
    gb, ga, gi = golden.match_brute_force(
        d1[:n1].astype(np.float64), d2[:n2].astype(np.float64)
    )
    np.testing.assert_array_equal(np.asarray(idx)[:n1], gi)
    np.testing.assert_allclose(np.asarray(best)[:n1], gb, rtol=1e-5, atol=1e-6)


def test_match_hybrid_rescore_fixes_bf16_flip():
    """Adversarial near-tie where the bfloat16x3 sweep provably misorders
    two candidates; the exact rescore must return the true winner.

    Construction: the sweep drops the lo*lo product of the hi/lo bfloat16
    split. With query entries 1.001 (lo_q ~ 1e-3) and two candidates whose
    lo parts are +/-3e-3, the dropped term swings the sweep scores by
    ~ +/-3.8e-4 while the exact scores differ by only ~1e-4 the OTHER way —
    so the sweep ranks the exact loser first. This is the exact failure
    mode that cost nm 990 -> 858 on the repetitive bundled pair when pure
    bf16 was tried in round 3 (ROADMAP.md)."""
    from cudasift_tpu.ops.pallas.match import match_descriptors_pallas
    import ml_dtypes

    def split(v):
        hi = v.astype(ml_dtypes.bfloat16).astype(np.float64)
        lo = (v - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return hi, lo.astype(np.float64)

    q = np.full(128, 1.001, np.float32)  # lo_q = +1e-3 per entry

    def exact64(x):
        return float(q.astype(np.float64) @ x.astype(np.float64))

    def sweep64(x):
        qh, ql = split(q)
        xh, xl = split(x)
        return float(qh @ xh + qh @ xl + ql @ xh)

    # cand_a: lo = -3e-3 everywhere (0.997 -> hi 1.0; 1.0048125 -> hi
    # 1.0078125); cand_b: lo = +3e-3 everywhere (1.003 -> hi 1.0). The
    # 30/98 mix makes the exact sums nearly equal; the spread nudge tips
    # exact_b above exact_a by 1e-4 without moving any hi rounding.
    cand_a = np.full(128, 1.0048125, np.float32)
    cand_a[:30] = np.float32(0.997)
    cand_b = np.full(128, 1.003, np.float32)
    diff = exact64(cand_a) - exact64(cand_b)
    cand_b[:100] += np.float32((diff + 1e-4) / 1.001 / 100)

    assert exact64(cand_b) > exact64(cand_a), "construction broken"
    assert sweep64(cand_a) > sweep64(cand_b), (
        "construction no longer trips the sweep; rebuild the adversarial pair"
    )

    rng = np.random.default_rng(7)
    d2 = rng.standard_normal((64, 128)).astype(np.float32) * 0.01
    d2[20] = cand_a
    d2[40] = cand_b
    d1 = np.stack([q] * 8)
    best, amb, idx = match_descriptors_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.int32(8), jnp.int32(64),
        rescore_k=8, interpret=True,
    )
    assert int(np.asarray(idx)[0]) == 40, np.asarray(idx)[:1]
    np.testing.assert_allclose(float(np.asarray(best)[0]), exact64(cand_b),
                               rtol=1e-6)
    # Ambiguity must also be decided on exact scores (2nd best = cand_a).
    np.testing.assert_allclose(
        float(np.asarray(amb)[0]), exact64(cand_a) / (exact64(cand_b) + 1e-6),
        rtol=1e-5)


def test_match_hybrid_duplicate_tiebreak_multitile():
    """Duplicate descriptors: lowest d2 index must win (matching the XLA
    twin's argmax), including across sweep-tile boundaries (n2 > T2)."""
    from cudasift_tpu.ops.pallas.match import match_descriptors_pallas, T2

    rng = np.random.default_rng(3)
    n2 = T2 + 300  # two d2 tiles
    d2 = rng.standard_normal((n2, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    q = d2[T2 + 100].copy()
    # Plant exact duplicates of the best match in both tiles; the winner
    # must be the lowest-index copy (tile 0), its duplicates the 2nd best.
    d2[50] = q
    d2[700] = q
    d1 = np.stack([q] * 4)
    best, amb, idx = match_descriptors_pallas(
        jnp.asarray(d1), jnp.asarray(d2), jnp.int32(4), jnp.int32(n2),
        rescore_k=8, interpret=True,
    )
    assert list(np.asarray(idx)) == [50] * 4, np.asarray(idx)
    np.testing.assert_allclose(np.asarray(amb), 1.0, rtol=1e-6)


def test_fused_orient_desc_matches_xla(rng):
    from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas
    from cudasift_tpu.ops.orient import compute_orientations

    img = make_image(rng)
    n = 16
    xp = jnp.asarray(rng.uniform(5, 150, n).astype(np.float32))
    yp = jnp.asarray(rng.uniform(5, 90, n).astype(np.float32))
    sc = jnp.asarray(rng.uniform(0.95, 1.87, n).astype(np.float32))
    d1, d2, o1, o2, h2 = orient_and_describe_pallas(
        jnp.asarray(img), xp, yp, sc, interpret=True
    )
    ro1, ro2, rh2 = compute_orientations(jnp.asarray(img), xp, yp, sc)
    # Orientations: same envelope as the split orientation kernel (exact
    # int-grid selection; atan2-poly boundary-bin flips move near-tie peaks).
    d = np.abs(np.asarray(o1) - np.asarray(ro1))
    d = np.minimum(d, 360.0 - d)
    assert np.median(d) < 0.2 and (d < 2.0).mean() >= 0.9, d
    assert (np.asarray(h2) == np.asarray(rh2)).mean() >= 0.9

    # Descriptors at the kernel's own orientations vs the XLA descriptor at
    # those same orientations: bf16-sampling envelope.
    ref1 = np.asarray(extract_descriptors(jnp.asarray(img), xp, yp, sc, o1))
    err = np.abs(np.asarray(d1) - ref1).max(axis=1)
    assert np.median(err) < 4e-3, err
    assert err.max() < 2e-2, err
    ref2 = np.asarray(extract_descriptors(jnp.asarray(img), xp, yp, sc, o2))
    both = np.asarray(h2) & np.asarray(rh2)
    if both.any():
        err2 = np.abs(np.asarray(d2) - ref2).max(axis=1)[both]
        assert err2.max() < 2e-2, err2
    # Norms: live descriptors are unit-length.
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d1), axis=1), 1.0,
                               atol=1e-4)


def test_fused_orient_desc_count_gating(rng):
    from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas

    img = make_image(rng)
    n = 16
    xp = jnp.asarray(rng.uniform(20, 140, n).astype(np.float32))
    yp = jnp.asarray(rng.uniform(20, 70, n).astype(np.float32))
    sc = jnp.asarray(np.full(n, 1.2, np.float32))
    full = orient_and_describe_pallas(jnp.asarray(img), xp, yp, sc,
                                      interpret=True)
    gated = orient_and_describe_pallas(jnp.asarray(img), xp, yp, sc,
                                       interpret=True, count=jnp.int32(8))
    # First 8 slots agree with the ungated run; slots past count are zero.
    np.testing.assert_allclose(np.asarray(gated[0])[:8],
                               np.asarray(full[0])[:8], atol=1e-6)
    assert np.abs(np.asarray(gated[0])[8:]).max() == 0.0
    assert not np.asarray(gated[4])[8:].any()


def test_refine_kernel_matches_xla(rng):
    from cudasift_tpu.ops.detect import (
        extrema_mask, compact_mask, refine_candidates)
    from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas
    from cudasift_tpu.ops import convolve
    from cudasift_tpu.config import laplace_kernels

    img = make_image(rng, h=80, w=144)
    blur = convolve.blur_multi(jnp.asarray(img), laplace_kernels(1)[0])
    dog = blur[1:] - blur[:-1]
    mask = extrema_mask(dog, 2.0, 10.0)
    idx, cnt = compact_mask(mask, 256)
    ref = refine_candidates(dog, idx, cnt, 10.0, 0.0)
    assert int(cnt) > 4
    xp, yp, sc, sh, ed, valid = refine_candidates_pallas(
        dog, idx, cnt, 10.0, 0.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
    # exp2 differs by 1 ulp between the Mosaic/interpret and XLA
    # lowerings; everything else is the same f32 arithmetic.
    for ours, theirs in ((xp, ref.xpos), (yp, ref.ypos), (sc, ref.scale),
                         (sh, ref.sharpness), (ed, ref.edgeness)):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(theirs), rtol=3e-7, atol=0)


def test_refine_padded_layout_matches_legacy(rng):
    """The raw/padded-layout refine path (stencil-padded DoG + 8-aligned
    lane DMA offsets, no overlap-blocked copy) must agree bit for bit with
    the legacy sliced-DoG path for the same logical candidates — including
    right-edge candidates where the 8-aligned ``ox`` clamp drives the
    in-tile offset toward its 125 ceiling, and a width that is NOT a lane
    multiple (clamp-padded tail lanes)."""
    from cudasift_tpu.ops.detect import extrema_mask, compact_mask
    from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
    from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas
    from cudasift_tpu.config import laplace_kernels

    h, w = 80, 200                       # w % 128 != 0
    img = make_image(rng, h=h, w=w)
    kern = laplace_kernels(1)[0]
    dog_raw, mask = dog_and_mask_pallas(
        jnp.asarray(img), kern, 2.0, 10.0, interpret=True, raw=True)
    dog, mask2 = dog_and_mask_pallas(
        jnp.asarray(img), kern, 2.0, 10.0, interpret=True)
    assert dog_raw.shape[1] >= h and dog_raw.shape[2] % 128 == 0
    np.testing.assert_array_equal(np.asarray(dog_raw[:, :h, :w]),
                                  np.asarray(dog))
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask2))

    # Natural candidates plus hand-placed ones hugging every edge, and at
    # x = 127/128 where the 3-column window crosses the first 128-lane
    # boundary (the wrap case the lane8=False pair fetch must handle).
    idx, cnt = compact_mask(mask, 64)
    forced = [(s, y, x) for s in (0, 4) for y in (1, h - 2)
              for x in (1, 127, 128, w - 3, w - 2)]
    extra = jnp.asarray([s * h * w + y * w + x for s, y, x in forced],
                        jnp.int32)
    # Forced entries first: capacity saturation by natural candidates must
    # never silently drop the edge/wrap coverage.
    idx = jnp.concatenate([extra, idx])[:64]
    cnt = jnp.minimum(cnt + len(forced), 64)

    legacy = refine_candidates_pallas(dog, idx, cnt, 10.0, 0.0,
                                      interpret=True)
    padded = refine_candidates_pallas(dog_raw, idx, cnt, 10.0, 0.0,
                                      interpret=True, logical_shape=(h, w))
    for a, b in zip(padded, legacy):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # lane8=False fallback (128-aligned offsets + conditional pair fetch):
    # the forced x = w-3/w-2 candidates exercise rl > 125 wrap handling.
    paired = refine_candidates_pallas(dog_raw, idx, cnt, 10.0, 0.0,
                                      interpret=True, logical_shape=(h, w),
                                      lane8=False)
    for a, b in zip(paired, legacy):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_border_keypoints_vs_golden(rng):
    """Quantifies the documented border deviation: within 7 px of the image
    edge the Pallas kernels clamp the integer tap index while keeping the
    subpixel fraction (ops/pallas/orient.py docstring); golden implements
    tex2D's continuous clamp. Measured deviation: orientation <= ~1.6 deg,
    descriptor <= ~1e-3 — bounded here so a regression can't hide in it."""
    from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas

    img = make_image(rng)
    h, w = img.shape
    pts = []
    for d in (1.3, 2.8, 4.1, 6.7):
        pts += [(d, 40.2, 1.1), (w - 1 - d, 50.5, 1.4),
                (80.3, d, 1.2), (30.7, h - 1 - d, 1.7)]
    xp = jnp.asarray([p[0] for p in pts])
    yp = jnp.asarray([p[1] for p in pts])
    sc = jnp.asarray([p[2] for p in pts])

    hist = orientation_histograms_pallas(jnp.asarray(img), xp, yp, sc,
                                         interpret=True)
    p1, _, _ = histogram_peaks(hist)
    d1, _, o1, _, _ = orient_and_describe_pallas(jnp.asarray(img), xp, yp, sc,
                                                 interpret=True)
    oerr_split, oerr_fused, derr = [], [], []
    for i, (x, y, s) in enumerate(pts):
        # Near-tie peak pairs can flip to the other peak under the clamp
        # deviation; compare against the closest golden orientation.
        oris = golden.compute_orientations(img, float(x), float(y), float(s))

        def best(v):
            d = [abs(v - o) for o in oris]
            return min(min(x, 360.0 - x) for x in d)

        oerr_split.append(best(float(p1[i])))
        oerr_fused.append(best(float(o1[i])))
        ref = golden.extract_descriptor(img, float(x), float(y), float(s),
                                        float(o1[i]))
        derr.append(np.abs(np.asarray(d1[i]) - ref).max())
    for errs in (oerr_split, oerr_fused):
        errs = np.asarray(errs)
        assert np.median(errs) < 0.1, errs
        assert (errs < 3.0).mean() >= 0.85, errs
    assert np.max(derr) < 5e-3, derr


def test_fast_gradients_close_to_exact(rng):
    """Opt-in dense-gradient sampling (SiftParams.fast_gradients): the
    orientation path is untouched (bit-identical) and descriptors deviate
    from the 4-tap exact path only by O(h^2) curvature terms — bounded here
    so the approximation can't silently degrade."""
    from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas

    img = make_image(rng)
    h, w = img.shape
    n = 16
    x = jnp.asarray(rng.uniform(25, w - 25, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(25, h - 25, n).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.95, 1.85, n).astype(np.float32))
    exact = orient_and_describe_pallas(jnp.asarray(img), x, y, s,
                                       interpret=True, fast=False)
    fast = orient_and_describe_pallas(jnp.asarray(img), x, y, s,
                                      interpret=True, fast=True)
    dori = np.abs(np.asarray(exact[2]) - np.asarray(fast[2]))
    dori = np.minimum(dori, 360.0 - dori)
    assert dori.max() == 0.0, dori
    de = np.asarray(exact[0])
    df = np.asarray(fast[0])
    cos = (de * df).sum(axis=1)
    assert cos.min() > 0.97, cos
    assert np.abs(de - df).max() < 0.08


def test_shift_gradients_close_to_exact(rng):
    """mode="shift" (rotation-aligned fractional-shift gradient fields):
    orientation is bit-identical to exact; descriptors deviate only by the
    double-bilinear smoothing of the tap, so they must sit strictly closer
    to exact than mode="fast" does (whose gradient axes are unrotated).
    Covers both scale buckets."""
    from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas

    img = make_image(rng)
    h, w = img.shape
    n = 16
    x = jnp.asarray(rng.uniform(30, w - 30, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(30, h - 30, n).astype(np.float32))
    s = np.concatenate([rng.uniform(0.95, 1.65, n - 4),
                        rng.uniform(1.8, 2.4, 4)]).astype(np.float32)
    s = jnp.asarray(s)
    exact = orient_and_describe_pallas(jnp.asarray(img), x, y, s,
                                       interpret=True, mode="exact")
    shift = orient_and_describe_pallas(jnp.asarray(img), x, y, s,
                                       interpret=True, mode="shift")
    dori = np.abs(np.asarray(exact[2]) - np.asarray(shift[2]))
    dori = np.minimum(dori, 360.0 - dori)
    assert dori.max() == 0.0, dori
    de = np.asarray(exact[0])
    ds = np.asarray(shift[0])
    cos = (de * ds).sum(axis=1)
    assert cos.min() > 0.985, cos
    assert np.abs(de - ds).max() < 0.05
    # Second-peak descriptors follow the same arithmetic.
    has2 = np.asarray(exact[4]) & np.asarray(shift[4])
    if has2.any():
        c2 = (np.asarray(exact[1])[has2] * np.asarray(shift[1])[has2]).sum(1)
        assert c2.min() > 0.985, c2


def test_fused_tiled_matches_untiled(rng, monkeypatch):
    """Images too large for one VMEM-resident slice run in y-tiles with
    32/40-row overlaps; every patch a keypoint reads lies inside its tile's
    extended slice, so the results must be EXACTLY the untiled ones."""
    import cudasift_tpu.ops.pallas.orient_desc as od

    img = make_image(rng)
    h, w = img.shape
    # n=16 matches the other fused tests' jit signature, so the untiled
    # baseline is an in-memory cache hit (a fresh interpret-mode trace of
    # this kernel costs ~43 s on this 1-core host).
    n = 16
    x = jnp.asarray(rng.uniform(20, w - 20, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(5, h - 5, n).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.95, 1.85, n).astype(np.float32))
    base = od.orient_and_describe_pallas(jnp.asarray(img), x, y, s,
                                         interpret=True)
    assert od.fused_tiles(h, w) == 1
    # Shrink the budget so the same image needs 2 tiles (each extra tile is
    # another ~9 s interpret-mode kernel trace; 2 covers the multi-tile code
    # paths — routing, overlap clamps, first/last-tile edges).
    tile_h = -(-h // 2) + od._TILE_TOP + od._TILE_BOT
    monkeypatch.setattr(
        od, "VMEM_IMAGE_LIMIT",
        (tile_h + od._PAD_R) * (w + od._PAD_C) * 4 + 1)
    assert od.fused_tiles(h, w) == 2
    od.orient_and_describe_pallas.clear_cache()
    try:
        tiled = od.orient_and_describe_pallas(jnp.asarray(img), x, y, s,
                                              interpret=True)
    finally:
        od.orient_and_describe_pallas.clear_cache()
    for a, b in zip(base, tiled):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
