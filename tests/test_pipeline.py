"""End-to-end extraction: golden-model keypoint parity and envelope checks.

The keypoint-parity test is the strongest correctness statement in the suite:
the full JAX pipeline must reproduce the golden model's keypoint set (which
restates the reference's semantics line by line) on a real image crop.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import golden
from cudasift_tpu import SiftParams, extract_sift
from cudasift_tpu.config import laplace_kernels


def golden_extract(img: np.ndarray, num_octaves: int, thresh: float):
    """Minimal golden end-to-end: returns a list of per-point dicts."""
    low = golden.low_pass(img.astype(np.float64), 1.0)
    ktab = golden.laplace_kernel_table(num_octaves)
    bases = [low]
    for _ in range(num_octaves - 1):
        bases.append(golden.scale_down(bases[-1]))
    points = []
    for o in reversed(range(num_octaves)):
        sub = float(2**o)
        dog = golden.dog_octave(bases[o], ktab[o])
        for (s, y, x) in golden.find_extrema(dog, thresh):
            r = golden.refine_point(dog, s, y, x)
            if r is None:
                continue
            oris = golden.compute_orientations(
                bases[o].astype(np.float32), r["xpos"], r["ypos"], r["scale"]
            )
            for ori in oris:
                desc = golden.extract_descriptor(
                    bases[o].astype(np.float32), r["xpos"], r["ypos"],
                    r["scale"], ori,
                )
                points.append(
                    dict(
                        xpos=r["xpos"] * sub, ypos=r["ypos"] * sub,
                        scale=r["scale"] * sub, orientation=ori, desc=desc,
                    )
                )
    return points


@pytest.mark.slow
def test_keypoint_parity_on_real_image(left_image):
    img = left_image[400:496, 500:628]  # small textured crop
    params = SiftParams(num_octaves=2, thresh=4.0, max_pts=2048)
    data = extract_sift(img, params)
    ref = golden_extract(img, 2, 4.0)
    n = int(data.num_pts)
    assert n == len(ref), (n, len(ref))

    gx = np.asarray(data.xpos)[:n]
    gy = np.asarray(data.ypos)[:n]
    gs = np.asarray(data.scale)[:n]
    go = np.asarray(data.orientation)[:n]
    gd = np.asarray(data.data)[:n]
    matched = 0
    desc_err = []
    for p in ref:
        dist = np.abs(gx - p["xpos"]) + np.abs(gy - p["ypos"]) + np.abs(gs - p["scale"])
        # Same point, same orientation peak (mod 360), nearest-neighbor match.
        dori = np.abs(go - p["orientation"])
        dori = np.minimum(dori, 360.0 - dori)
        cand = (dist < 0.5) & (dori < 2.0)
        if cand.any():
            i = np.argmin(np.where(cand, dist, np.inf))
            matched += 1
            desc_err.append(np.abs(gd[i] - p["desc"]).max())
    assert matched / len(ref) >= 0.99, f"parity {matched}/{len(ref)}"
    assert np.median(desc_err) < 5e-3


def test_extraction_deterministic(left_image):
    img = left_image[400:528, 500:660]
    params = SiftParams(num_octaves=3, thresh=4.5, max_pts=1024)
    d1 = extract_sift(img, params)
    d2 = extract_sift(img, params)
    np.testing.assert_array_equal(np.asarray(d1.xpos), np.asarray(d2.xpos))
    np.testing.assert_array_equal(np.asarray(d1.data), np.asarray(d2.data))


def test_capacity_overflow_saturates(left_image):
    img = left_image[400:528, 500:660]
    params = SiftParams(num_octaves=3, thresh=2.0, max_pts=64)
    d = extract_sift(img, params)
    assert int(d.num_pts) == 64  # saturated, not crashed
    assert np.isfinite(np.asarray(d.xpos)).all()


def test_scale_up_path(left_image):
    img = left_image[400:496, 500:628]
    d_up = extract_sift(img, SiftParams(num_octaves=2, thresh=4.0, scale_up=True))
    d_no = extract_sift(img, SiftParams(num_octaves=2, thresh=4.0))
    # Upscaling finds more, finer features; positions stay in original coords.
    assert int(d_up.num_pts) > int(d_no.num_pts)
    v = np.asarray(d_up.valid_mask())
    assert np.asarray(d_up.xpos)[v].max() <= img.shape[1]
    assert np.asarray(d_up.ypos)[v].max() <= img.shape[0]
    # subsampling reflects the doubled grid then the 0.5 rescale keeps scale
    # comparable: smallest scales should be ~half of the non-upscaled ones.
    assert np.asarray(d_up.scale)[v].min() < np.asarray(d_no.scale)[np.asarray(d_no.valid_mask())].min()


@pytest.mark.slow
def test_keypoint_parity_scale_up(left_image):
    """Golden parity for the upscale path (ScaleUp -> LowPass -> extract at
    2x -> RescalePositions 0.5, cudaSiftH.cu:118-131), same statement as
    test_keypoint_parity_on_real_image for scale_up=True."""
    img = left_image[400:496, 500:628]
    params = SiftParams(num_octaves=2, thresh=4.0, max_pts=4096,
                        scale_up=True, lowest_scale=0.5)
    data = extract_sift(img, params)
    up = golden.scale_up(img.astype(np.float64))
    ref = [p for p in golden_extract(up, 2, 4.0)
           if p["scale"] >= 1.0]  # lowestScale doubled (cudaSiftH.cu:127)
    for p in ref:  # RescalePositions(0.5)
        p["xpos"] *= 0.5
        p["ypos"] *= 0.5
        p["scale"] *= 0.5
    n = int(data.num_pts)
    assert n == len(ref), (n, len(ref))
    gx = np.asarray(data.xpos)[:n]
    gy = np.asarray(data.ypos)[:n]
    gs = np.asarray(data.scale)[:n]
    go = np.asarray(data.orientation)[:n]
    gd = np.asarray(data.data)[:n]
    matched = 0
    desc_err = []
    for p in ref:
        dist = (np.abs(gx - p["xpos"]) + np.abs(gy - p["ypos"])
                + np.abs(gs - p["scale"]))
        dori = np.abs(go - p["orientation"])
        dori = np.minimum(dori, 360.0 - dori)
        cand = (dist < 0.25) & (dori < 2.0)
        if cand.any():
            i = np.argmin(np.where(cand, dist, np.inf))
            matched += 1
            desc_err.append(np.abs(gd[i] - p["desc"]).max())
    assert matched / len(ref) >= 0.99, f"parity {matched}/{len(ref)}"
    assert np.median(desc_err) < 5e-3


def test_throughput_batch_matches_single(left_image):
    """extract_sift_throughput (one program, N frames) must reproduce the
    single-frame pipeline exactly per frame."""
    from cudasift_tpu import extract_sift_throughput

    frames = np.stack([
        left_image[300:396, 400:528],
        left_image[500:596, 700:828],
        left_image[100:196, 200:328],
    ])
    params = SiftParams(num_octaves=2, thresh=4.0, max_pts=1024)
    batch = extract_sift_throughput(frames, params)
    assert batch.num_pts.shape == (3,)
    for i in range(3):
        single = extract_sift(frames[i], params)
        assert int(batch.num_pts[i]) == int(single.num_pts)
        np.testing.assert_array_equal(
            np.asarray(batch.xpos[i]), np.asarray(single.xpos))
        np.testing.assert_array_equal(
            np.asarray(batch.data[i]), np.asarray(single.data))

    with pytest.raises(ValueError):
        extract_sift_throughput(frames[0], params)


@pytest.mark.slow
def test_fused_pipeline_branch_interpret_matches_xla(left_image, monkeypatch):
    """Drives the TPU fused pipeline BRANCH (stencil -> compact -> refine ->
    pre-describe compaction -> fused orient+desc -> dup/merge glue) on CPU by
    forcing _on_tpu and interpret-mode kernels. The on-chip gate
    (test_tpu.py::test_fused_vs_split_pipeline_on_chip) validates Mosaic
    lowering; this validates the same glue when no chip is reachable.
    Expected agreement: same keypoint set as the XLA path within the
    measured fused-kernel envelope (set overlap >= 0.97)."""
    import functools
    import jax

    import cudasift_tpu.pipeline as pl
    from cudasift_tpu.ops.pallas import dog as dogmod
    from cudasift_tpu.ops.pallas import refine as refmod
    from cudasift_tpu.ops.pallas import orient_desc as odmod

    monkeypatch.setattr(pl, "_on_tpu", lambda: True)
    for mod, name in ((dogmod, "dog_and_mask_pallas"),
                      (refmod, "refine_candidates_pallas"),
                      (odmod, "orient_and_describe_pallas")):
        monkeypatch.setattr(mod, name,
                            functools.partial(getattr(mod, name),
                                              interpret=True))

    img = jnp.asarray(left_image[300:492, 600:856])      # 192x256 facade crop
    params = SiftParams(num_octaves=1, thresh=2.0, max_pts=1024)
    fused = jax.jit(pl._extract_sift_traced,
                    static_argnames="params")(img, params)
    monkeypatch.setattr(pl, "_on_tpu", lambda: False)
    ref = jax.jit(pl._extract_sift_traced,
                  static_argnames="params")(img, params)

    nf, ns = int(fused.num_pts), int(ref.num_pts)
    assert nf > 30 and ns > 30

    def keyset(d, n):
        return {
            (round(float(x), 2), round(float(y), 2), round(float(s), 2))
            for x, y, s in zip(np.asarray(d.xpos)[:n], np.asarray(d.ypos)[:n],
                               np.asarray(d.scale)[:n])
        }

    kf, ks = keyset(fused, nf), keyset(ref, ns)
    overlap = len(kf & ks) / max(len(kf), len(ks))
    assert overlap >= 0.97, (overlap, nf, ns)
    # Descriptors finite + normalized on live slots.
    df = np.asarray(fused.data)[:nf]
    assert np.isfinite(df).all()
    norms = np.linalg.norm(df, axis=1)
    np.testing.assert_allclose(norms[norms > 0], 1.0, atol=2e-2)


class TestRefineLayoutHealing:
    """The refine_layout="auto" resolution chain (pipeline._effective_params
    + _probe_refine_layout). The on-chip halves live in tests/test_tpu.py;
    these cover the pure-Python selection logic."""

    def test_cpu_is_identity(self):
        from cudasift_tpu import pipeline

        p = SiftParams()
        assert pipeline._effective_params(p) is p  # layout is TPU-only

    def test_explicit_tier_skips_probe(self, monkeypatch):
        import dataclasses

        from cudasift_tpu import pipeline

        monkeypatch.setattr(pipeline, "_on_tpu", lambda: True)

        def boom():
            raise AssertionError("probe must not run for explicit tiers")

        monkeypatch.setattr(pipeline, "_probe_refine_layout", boom)
        for tier in ("lane8", "pair", "copy"):
            p = dataclasses.replace(SiftParams(), refine_layout=tier)
            assert pipeline._effective_params(p) is p

    def test_auto_resolves_via_probe(self, monkeypatch):
        from cudasift_tpu import pipeline

        monkeypatch.setattr(pipeline, "_on_tpu", lambda: True)
        monkeypatch.setattr(pipeline, "_probe_refine_layout", lambda: "pair")
        eff = pipeline._effective_params(SiftParams())
        assert eff.refine_layout == "pair"

    def test_auto_under_trace_degrades_to_copy(self, monkeypatch, capsys):
        """A direct caller that jits around the public API before any probe
        ran must get the portable tier plus a loud warning, never a crash
        (the round-3 bench died exactly here)."""
        import jax

        from cudasift_tpu import pipeline

        monkeypatch.setattr(pipeline, "_on_tpu", lambda: True)

        class NeverProbed:
            def __call__(self):
                raise AssertionError("probe must not dispatch under trace")

            def cache_info(self):
                from functools import lru_cache

                return lru_cache(maxsize=1)(lambda: None).cache_info()

        monkeypatch.setattr(pipeline, "_probe_refine_layout", NeverProbed())

        seen = {}

        def traced(x):
            seen["tier"] = pipeline._effective_params(
                SiftParams()).refine_layout
            return x

        jax.jit(traced)(jnp.zeros(()))
        assert seen["tier"] == "copy"
        assert "refine_layout" in capsys.readouterr().err

    def test_env_override(self, monkeypatch):
        from cudasift_tpu import pipeline

        monkeypatch.setenv("CUDASIFT_REFINE_LAYOUT", "copy")
        pipeline._probe_refine_layout.cache_clear()
        try:
            assert pipeline._probe_refine_layout() == "copy"
        finally:
            pipeline._probe_refine_layout.cache_clear()

    def test_env_override_rejects_garbage(self, monkeypatch):
        from cudasift_tpu import pipeline

        monkeypatch.setenv("CUDASIFT_REFINE_LAYOUT", "fastest")
        pipeline._probe_refine_layout.cache_clear()
        try:
            with pytest.raises(ValueError, match="lane8|pair|copy"):
                pipeline._probe_refine_layout()
        finally:
            pipeline._probe_refine_layout.cache_clear()

    def test_transient_error_classifier(self):
        from cudasift_tpu.pipeline import _transient_error

        assert _transient_error(RuntimeError("RESOURCE_EXHAUSTED: hbm"))
        assert _transient_error(OSError("Connection reset by tunnel"))
        assert not _transient_error(RuntimeError(
            "Mosaic failed to compile TPU kernel: Failed to prove that a "
            "tile index in dimension 2 is divisible by the tiling (128)."))


def test_overflow_signal_reports_capacity_drops():
    """Saturating the candidate caps must be observable in SiftData.overflow
    (SURVEY section 5.3): dense noise at a low threshold floods a tiny
    max_pts. The zero side (in-envelope fixture => overflow == 0) is
    asserted in test_envelope.py."""
    from cudasift_tpu import extract_sift

    img = jnp.asarray(
        np.random.default_rng(3).uniform(0, 255, (128, 160)).astype(
            np.float32))
    params = SiftParams(num_octaves=1, thresh=0.5, max_pts=128,
                        min_candidates=128)
    d = extract_sift(img, params)
    assert int(d.num_pts) == 128          # saturated
    assert int(d.overflow) > 0            # ... and says so
