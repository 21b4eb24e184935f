"""On-TPU cross-implementation agreement gate.

The reference's only automated check is exactly this kind of
cross-implementation agreement (CheckMatches, match.cu:132-141): the
optimized GPU path must reproduce a simpler trusted path on the same
hardware. The CPU pytest suite validates Pallas kernels in interpret mode;
Mosaic *lowering* divergences (the bug class this project actually hits)
only surface on the real chip. These tests run the fused/Pallas TPU paths
against their XLA twins on-chip.

Run with:  CUDASIFT_TEST_TPU=1 python -m pytest tests/test_tpu.py -q
(~4 min: dominated by two extract_sift compiles on the fixture crop).
Skipped automatically in the CPU suite.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cudasift_tpu as cs
from cudasift_tpu.config import SiftParams

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() in ("cpu",),
        reason="needs the real TPU backend (set CUDASIFT_TEST_TPU=1)",
    ),
]


@pytest.fixture(scope="module")
def crop(left_image):
    # 512x640 crop: big enough for ~600 keypoints over 4 octaves, small
    # enough that the two extract_sift compiles stay ~1 min each.
    return jnp.asarray(left_image[200:712, 300:940])


def _assert_refine_agreement(ref, out):
    """Bit equality on every field except scale, which is exp2-derived:
    Mosaic's exp2 lowering differs from XLA's by 1 ulp on some libtpu
    versions (observed on-chip 2026-08: 1/1024 candidates, 6.3e-8 rel; the
    interpret-mode test tolerates the same bound, tests/test_pallas.py)."""
    for a, b, name in zip(ref, out, ["x", "y", "sc", "sh", "ed", "valid"]):
        a, b = np.asarray(a), np.asarray(b)
        if name == "sc":
            np.testing.assert_allclose(a, b, rtol=3e-7, atol=0, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_refine_pallas_bit_agreement_on_chip(left_image):
    from cudasift_tpu.ops import convolve
    from cudasift_tpu.ops.detect import (
        extrema_mask, compact_mask, refine_candidates,
    )
    from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas

    params = SiftParams(num_octaves=3, thresh=2.0)
    img = jnp.asarray(left_image[:384, :512])
    low = convolve.low_pass(img, 1.0)
    blur = convolve.blur_multi(low, params.laplace_kernels[0])
    dog = blur[1:] - blur[:-1]
    mask = extrema_mask(dog, 2.0, 10.0)
    idx, cnt = compact_mask(mask, 1024)
    assert int(cnt) > 50
    ref = refine_candidates(dog, idx, cnt, 10.0, 0.0)
    out = refine_candidates_pallas(dog, idx, cnt, 10.0, 0.0)
    _assert_refine_agreement(ref, out)


def test_refine_layout_probe_on_chip():
    """The once-per-process layout probe must resolve to a concrete tier,
    and _effective_params must pin it into the params."""
    from cudasift_tpu.pipeline import _effective_params, _probe_refine_layout

    tier = _probe_refine_layout()
    assert tier in ("lane8", "pair", "copy")
    eff = _effective_params(SiftParams())
    assert eff.refine_layout == tier


@pytest.mark.parametrize("lane8", [True, False], ids=["lane8", "pair"])
def test_refine_padded_layout_bit_agreement_on_chip(left_image, lane8):
    """The padded-layout direct-DMA tiers (raw stencil DoG + 8- or
    128-aligned lane DMA offsets) vs the XLA twin on the same candidates.
    Interpret mode cannot validate Mosaic's DMA-offset alignment rules —
    only the chip can. A tier the probe rejected is SKIPPED (strict Mosaics
    legitimately refuse lane8); a tier the probe accepted must run and
    agree bit for bit."""
    from cudasift_tpu.ops import convolve
    from cudasift_tpu.ops.detect import compact_mask, refine_candidates
    from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
    from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas
    from cudasift_tpu.pipeline import _probe_refine_layout

    tier = "lane8" if lane8 else "pair"
    probed = _probe_refine_layout()
    order = ("lane8", "pair", "copy")
    probe_rejected = order.index(probed) > order.index(tier)

    params = SiftParams(num_octaves=3, thresh=2.0)
    img = jnp.asarray(left_image[:384, :512])
    h, w = img.shape
    low = convolve.low_pass(img, 1.0)
    kern = params.laplace_kernels[0]
    dog_raw, mask = dog_and_mask_pallas(low, kern, 2.0, 10.0, raw=True)
    idx, cnt = compact_mask(mask, 1024)
    # Force right-edge candidates (the ox clamp drives the in-tile lane
    # offset toward its ceiling) and lane-tile-crossing windows at
    # x = 127/128 (the pair tier's conditional second fetch).
    forced = [(s, y, x) for s in (0, 4) for y in (1, h - 2)
              for x in (127, 128, w - 3, w - 2)]
    extra = jnp.asarray([s * h * w + y * w + x for s, y, x in forced],
                        jnp.int32)
    # Forced entries go FIRST so natural candidates saturating the capacity
    # can never silently truncate the edge coverage this test exists for.
    idx = jnp.concatenate([extra, idx])[:1024]
    cnt = jnp.minimum(cnt + len(forced), 1024)
    assert int(cnt) > 50

    # XLA twin on the pallas-stencil DoG values (sliced view) so the
    # comparison isolates the refine kernels, not the stencils.
    ref = refine_candidates(dog_raw[:, :h, :w], idx, cnt, 10.0, 0.0)
    try:
        out = refine_candidates_pallas(dog_raw, idx, cnt, 10.0, 0.0,
                                       logical_shape=(h, w), lane8=lane8)
        out = [np.asarray(o) for o in out]
    except Exception:
        if probe_rejected:
            pytest.skip(f"Mosaic rejects {tier!r} (probed tier: {probed!r})")
        raise  # the probe certified this tier — a failure here is a bug
    _assert_refine_agreement(ref, out)


def test_dog_stencil_mask_agreement_on_chip(left_image):
    from cudasift_tpu.ops import convolve
    from cudasift_tpu.ops.detect import extrema_mask
    from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas

    params = SiftParams(num_octaves=3, thresh=3.0)
    img = jnp.asarray(left_image[:384, :512])
    low = convolve.low_pass(img, 1.0)
    kern = params.laplace_kernels[0]

    blur = convolve.blur_multi(low, kern)
    dog_x = blur[1:] - blur[:-1]
    mask_x = np.asarray(extrema_mask(dog_x, 3.0, 10.0))

    dog_p, mask_p = dog_and_mask_pallas(low, kern, 3.0, 10.0)
    # DoG planes: elementwise agreement within f32 stencil-order noise.
    scale = float(np.abs(np.asarray(dog_x)).max())
    np.testing.assert_allclose(
        np.asarray(dog_p), np.asarray(dog_x), atol=2e-4 * max(scale, 1.0)
    )
    # Candidate masks may flip only on razor-edge pixels.
    flips = int((np.asarray(mask_p) != mask_x).sum())
    assert flips <= max(3, int(0.002 * mask_x.sum())), (
        flips, int(mask_x.sum())
    )


def test_pallas_compact_pipeline_on_chip(left_image):
    """SiftParams.use_pallas_compact must produce the identical point set
    (compaction order defines keypoint order, so bit-equality is the bar)."""
    img = jnp.asarray(left_image[:256, :320])
    base = SiftParams(num_octaves=2, thresh=3.0, max_pts=2048)
    d_x = cs.extract_sift(img, base)
    d_p = cs.extract_sift(
        img, dataclasses.replace(base, use_pallas_compact=True))
    assert int(d_x.num_pts) == int(d_p.num_pts)
    for f in ("xpos", "ypos", "scale", "orientation", "data"):
        np.testing.assert_array_equal(
            np.asarray(getattr(d_x, f)), np.asarray(getattr(d_p, f)),
            err_msg=f)


def test_matcher_exactness_on_chip(rng):
    from cudasift_tpu.ops.match import match_descriptors
    from cudasift_tpu.ops.pallas.match import match_descriptors_pallas

    d1 = rng.normal(size=(1536, 128)).astype(np.float32)
    d2 = rng.normal(size=(2048, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    n1 = jnp.int32(1400)
    n2 = jnp.int32(1900)
    sc_x, amb_x, idx_x = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), n1, n2
    )
    sc_p, amb_p, idx_p = match_descriptors_pallas(
        jnp.asarray(d1), jnp.asarray(d2), n1, n2
    )
    # Index agreement must be exact (CheckMatches, match.cu:132-141);
    # compare live rows only (slots past n1 are don't-care padding).
    n = 1400
    np.testing.assert_array_equal(np.asarray(idx_x)[:n], np.asarray(idx_p)[:n])
    np.testing.assert_allclose(
        np.asarray(sc_x)[:n], np.asarray(sc_p)[:n], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(amb_x)[:n], np.asarray(amb_p)[:n], atol=1e-4
    )


def test_fused_vs_split_pipeline_on_chip(crop):
    """Fused orient+descriptor kernel vs split Pallas kernels, end to end.

    Pins grad_mode="exact": this test checks the fused KERNEL MECHANICS
    against the split kernels' identical arithmetic; the shift default's
    deliberate smoothing deviation is bounded separately below."""
    base = SiftParams(num_octaves=4, init_blur=1.0, thresh=4.0, max_pts=8192,
                      grad_mode="exact")
    df = cs.extract_sift(crop, dataclasses.replace(base, use_fused=True))
    ds = cs.extract_sift(crop, dataclasses.replace(base, use_fused=False))
    nf, ns = int(df.num_pts), int(ds.num_pts)
    assert nf > 200 and ns > 200

    def keyset(d, n):
        return {
            (round(float(x), 2), round(float(y), 2), round(float(s), 2))
            for x, y, s in zip(
                np.asarray(d.xpos)[:n], np.asarray(d.ypos)[:n],
                np.asarray(d.scale)[:n])
        }

    kf, ks = keyset(df, nf), keyset(ds, ns)
    overlap = len(kf & ks) / max(len(kf), len(ks))
    assert overlap >= 0.98, overlap

    # Orientation / descriptor agreement on position-matched points.
    tf = {}
    for i in range(nf):
        key = (round(float(np.asarray(df.xpos)[i]), 2),
               round(float(np.asarray(df.ypos)[i]), 2))
        tf.setdefault(key, []).append(i)
    ori_f = np.asarray(df.orientation)
    ori_s = np.asarray(ds.orientation)
    data_f = np.asarray(df.data)
    data_s = np.asarray(ds.data)
    oerr, derr = [], []
    for i in range(ns):
        key = (round(float(np.asarray(ds.xpos)[i]), 2),
               round(float(np.asarray(ds.ypos)[i]), 2))
        js = tf.get(key)
        if not js or len(js) != 1:
            continue
        j = js[0]
        do = abs(ori_f[j] - ori_s[i])
        oerr.append(min(do, 360.0 - do))
        derr.append(float(np.abs(data_f[j] - data_s[i]).max()))
    oerr = np.asarray(oerr)
    derr = np.asarray(derr)
    assert len(oerr) > 100
    # Bands from the measured bf16 envelope (ROADMAP.md): orientations agree
    # to <2 deg on ~all singleton points; descriptors to ~2e-3 p99.
    assert (oerr < 2.0).mean() >= 0.95, (oerr > 2).sum()
    assert np.percentile(derr, 99) < 5e-3, np.percentile(derr, 99)


def test_shift_grad_mode_on_chip(crop):
    """grad_mode="shift" on the real chip: identical keypoint set and
    orientations to exact (phases 1-3 untouched), descriptors within the
    double-bilinear smoothing envelope (interpret-mode test bound)."""
    base = SiftParams(num_octaves=4, init_blur=1.0, thresh=4.0, max_pts=8192,
                      grad_mode="exact")
    de = cs.extract_sift(crop, base)
    dsft = cs.extract_sift(crop, dataclasses.replace(base, grad_mode="shift"))
    ne, nsh = int(de.num_pts), int(dsft.num_pts)
    assert ne == nsh and ne > 200
    np.testing.assert_array_equal(
        np.asarray(de.xpos)[:ne], np.asarray(dsft.xpos)[:ne])
    np.testing.assert_array_equal(
        np.asarray(de.orientation)[:ne], np.asarray(dsft.orientation)[:ne])
    a = np.asarray(de.data)[:ne]
    b = np.asarray(dsft.data)[:ne]
    cos = (a * b).sum(axis=1)
    # Interior keypoints sit at cosine ~0.9998; the tail is border keypoints
    # (image-edge distance < ~17 px at high octaves), where shift's sample
    # clip [1, P-2] diverges from exact's tap clamp [0, P-1] — the same
    # class as the documented exact-vs-golden border deviation (measured on
    # this crop: min 0.880 at bdist 4.8, p1 0.986, p5 0.995).
    assert np.median(cos) > 0.997, np.median(cos)
    assert np.percentile(cos, 5) > 0.99, np.percentile(cos, 5)
    assert cos.min() > 0.85, cos.min()
