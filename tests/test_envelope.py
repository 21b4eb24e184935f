"""Full-fixture verification envelope — the reference's de-facto e2e test.

The reference's strongest end-to-end statement is its README parameter table
(README.md:111-134): running the demo flow (mainSift.cpp:55-81) on the
bundled 1280x960 stereo pair must produce feature counts, homography-refined
match counts (numFit) and %match rates inside published envelopes. These
tests replicate that flow with the demo's exact parameters and assert we
stay inside generous bands around the published numbers, plus a
MatchAll-style consistency check of matches against the fitted homography
(mainSift.cpp:95-148).

Accounting notes:
- The reference under-reports numPts by excluding the full-resolution
  octave's second-orientation duplicates: it reads
  d_PointCounter[2*numOctaves], which the duplicates (counter 2*numOctaves+1)
  sit beyond (cudaSiftH.cu:115, cudaSiftD.cu:1049). We report the full count
  in SiftData.num_pts (documented deviation, ROADMAP.md) and compute the
  reference-style count here by trimming that trailing duplicate block, so
  both rates are asserted.
- %Matches = numFit / min(numPts) (mainSift.cpp:80-81).

Measured on this implementation (CPU, exact demo params, round 3 — after the
per-octave candidate caps stopped saturating on this fixture):
  thresh 3.0: ref-style feats 3924/5451, numFit 1918, rate 48.9%
              (reference table: 1627 at 45.8% — we exceed both)
  thresh 4.0: ref-style feats 2044/2944, numFit 1033, rate 50.5%
              (reference table:  881 at 48.5%)
  inlier residuals: median ~1.0-1.2 px, p90 ~2.1 px at thresh 3.0
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cudasift_tpu as cs
from cudasift_tpu import SiftParams


# numPts as the reference reports it (trailing duplicate-block trim) — the
# shared library helper so bench.py and this test can't drift apart.
ref_style_numpts = cs.ref_style_num_pts


@pytest.fixture(scope="module")
def stereo_pair():
    import cv2

    left = cv2.imread("/root/reference/data/left.pgm", 0)
    righ = cv2.imread("/root/reference/data/righ.pgm", 0)
    assert left is not None and righ is not None
    return left.astype(np.float32), righ.astype(np.float32)


def demo_flow(left, righ, thresh, scale_up=False, num_loops=10000):
    """mainSift.cpp:55-81 with the demo's exact parameters."""
    params = SiftParams(num_octaves=5, init_blur=1.0, thresh=thresh,
                        max_pts=32768, scale_up=scale_up)
    d1 = cs.extract_sift(left, params)
    d2 = cs.extract_sift(righ, params)
    d1 = cs.match_sift_data(d1, d2)
    H, nm = cs.find_homography(d1, jax.random.PRNGKey(0),
                               num_loops=num_loops, min_score=0.0,
                               max_ambiguity=0.8, thresh=5.0)
    H2, numfit, err = cs.improve_homography(d1, H, 5, 0.0, 0.80, 3.0)
    return d1, d2, np.asarray(H2), int(nm), int(numfit), np.asarray(err)


# (thresh, ref_numfit, ref_rate_pct) from README.md:113-121, plus the
# values measured on this implementation (CPU, ref-style accounting) that
# the +-10% / +-4-point regression bands anchor to.
ENVELOPES = [
    (3.0, 1627, 45.8, 1918, 48.9, 3924),
    (4.0, 881, 48.5, 1033, 50.5, 2044),
]


@pytest.mark.slow
@pytest.mark.parametrize(
    "thresh,ref_fit,ref_rate,meas_fit,meas_rate,meas_feats", ENVELOPES
)
def test_full_fixture_envelope(stereo_pair, thresh, ref_fit, ref_rate,
                               meas_fit, meas_rate, meas_feats):
    left, righ = stereo_pair
    d1, d2, H, nm, numfit, err = demo_flow(left, righ, thresh)
    # The fixture is in-envelope: no candidate capacity may saturate
    # (SURVEY section 5.3 — silent drops cost ~11% of features pre-r3).
    assert int(d1.overflow) == 0 and int(d2.overflow) == 0, (
        int(d1.overflow), int(d2.overflow))
    n1, n2 = int(d1.num_pts), int(d2.num_pts)
    r1, r2 = ref_style_numpts(d1), ref_style_numpts(d2)
    nmin_ref = min(r1, r2)
    numfit_ref = int((err[:r1] < 3.0).sum())
    rate_ref_style = 100.0 * numfit_ref / nmin_ref

    # Beat-the-table floor: reference-style numFit and rate must stay at or
    # above the reference's published row (small slack for backend drift).
    assert numfit_ref >= 0.95 * ref_fit, (numfit_ref, ref_fit)
    assert rate_ref_style >= ref_rate - 2.0, (rate_ref_style, ref_rate)
    # Regression bands around the measured level: +-10% counts,
    # +-4 points rate.
    assert 0.9 * meas_feats <= nmin_ref <= 1.1 * meas_feats, (
        nmin_ref, meas_feats)
    assert 0.9 * meas_fit <= numfit_ref <= 1.1 * meas_fit, (
        numfit_ref, meas_fit)
    assert abs(rate_ref_style - meas_rate) <= 4.0, (rate_ref_style, meas_rate)
    # Residual tightness (ADVICE r2): numFit gains must not come from a
    # looser consensus — inlier errors stay sub-1.5-px at the median.
    fit_err = err[:n1][err[:n1] < 3.0]
    assert np.median(fit_err) <= 1.5, np.median(fit_err)

    # MatchAll-style consistency (mainSift.cpp:95-148): among ratio-test
    # accepted matches, a solid majority must agree with the fitted
    # homography within err^2 < 100 px^2.
    v = np.arange(n1)
    amb = np.asarray(d1.ambiguity)[:n1]
    mx = np.asarray(d1.match_xpos)[:n1]
    my = np.asarray(d1.match_ypos)[:n1]
    xs = np.asarray(d1.xpos)[:n1]
    ys = np.asarray(d1.ypos)[:n1]
    sel = amb < 0.80
    den = H[2, 0] * xs + H[2, 1] * ys + H[2, 2]
    px = (H[0, 0] * xs + H[0, 1] * ys + H[0, 2]) / den
    py = (H[1, 0] * xs + H[1, 1] * ys + H[1, 2]) / den
    err2 = (px - mx) ** 2 + (py - my) ** 2
    agree = (err2[sel] < 100.0).mean()
    assert agree > 0.5, agree
    # And the RANSAC inlier count must be a sane fraction of the accepted set.
    assert nm >= 0.3 * sel.sum(), (nm, int(sel.sum()))


@pytest.mark.slow
def test_full_fixture_envelope_upscale(stereo_pair):
    # README.md:124-134, upScale=True at thresh 4.5: 954 matches, 42.2%.
    # Our upscale pipeline is semantically faithful (ScaleUp -> LowPass ->
    # loop at 2x -> RescalePositions, cudaSiftH.cu:118-131) but finds ~50%
    # more features than the table at a comparable rate (measured round 3:
    # 3426/3702 feats, numFit 1373, 40.1%, median inlier err 0.94 px).
    # Root cause of the surplus (deviations ledger, ROADMAP.md): per-octave
    # extrema decomposition shows upscale octaves 2-4 mirror the no-upscale
    # octaves 1-3 at 1.0-1.2x, while the surplus sits in the NEW finest
    # octave (interpolation-scale features the table's flow also extracts)
    # and in upscale octave 1 (2.5x plain octave 0: LowPass sigma=initBlur
    # is applied in upscaled-pixel units, cudaSiftH.cu:124, halving the
    # effective prefilter for same-scale content). Both effects are shared
    # with the reference flow; the table's GPU/code vintage is unknowable,
    # so the bands guard today's measured behavior.
    left, righ = stereo_pair
    d1, d2, H, nm, numfit, err = demo_flow(left, righ, 4.5, scale_up=True,
                                           num_loops=4096)
    n1, n2 = int(d1.num_pts), int(d2.num_pts)
    nmin = min(n1, n2)
    rate = 100.0 * numfit / nmin
    assert 0.9 * 1373 <= numfit <= 1.1 * 1373, numfit
    assert abs(rate - 40.1) <= 4.0, rate
    fit_err = err[:n1][err[:n1] < 3.0]
    assert np.median(fit_err) <= 1.5, np.median(fit_err)
    # Positions stay in original-image coordinates after RescalePositions.
    vmask = np.asarray(d1.valid_mask())
    assert np.asarray(d1.xpos)[vmask].max() <= left.shape[1]
    assert np.asarray(d1.ypos)[vmask].max() <= left.shape[0]


@pytest.mark.slow
def test_full_fixture_envelope_fast_gradients(stereo_pair):
    """Regression guard for the opt-in fast_gradients path at thresh 4.0.

    The gradient-field approximation costs real match quality on this
    repetitive pair — the ratio test is hypersensitive to descriptor
    perturbations (measured on TPU at round 2: numFit 434, rate 19.9% vs
    the exact path's 806 / 36.9%) — so the bands guard today's measured
    level, not the exact-path envelope. Only meaningful on TPU —
    fast_gradients lives in the fused Pallas kernel; the CPU/XLA path
    ignores it."""
    if jax.default_backend() == "cpu":
        pytest.skip("fast_gradients is a TPU fused-kernel feature")
    left, righ = stereo_pair
    params = SiftParams(num_octaves=5, init_blur=1.0, thresh=4.0,
                        max_pts=32768, fast_gradients=True)
    d1 = cs.extract_sift(left, params)
    d2 = cs.extract_sift(righ, params)
    d1 = cs.match_sift_data(d1, d2)
    H, nm = cs.find_homography(d1, jax.random.PRNGKey(0), num_loops=4096,
                               min_score=0.0, max_ambiguity=0.8, thresh=5.0)
    H2, numfit, err = cs.improve_homography(d1, H, 5, 0.0, 0.80, 3.0)
    nmin = min(int(d1.num_pts), int(d2.num_pts))
    rate = 100.0 * int(numfit) / nmin
    assert int(numfit) >= 300, numfit
    assert rate >= 14.0, rate
