"""Benchmark harness — run on the real TPU chip by the round driver.

Measures the reference's headline benchmarks (BASELINE.md):
  - SIFT extraction at 1280x960 and 1920x1080 (5 octaves, initBlur=1.0,
    thresh=3.0, 32768-pt capacity — mainSift.cpp:58-67)
  - brute-force matching of two ~2k x 128-D descriptor sets
  - 16K x 16K random-set matching (match.cu benchmark)

Prints ONE JSON line with the primary metric (extraction ms at 1920x1080;
vs_baseline is the ratio against the 1.0 ms TPU target from BASELINE.json —
lower is better, < 1.0 beats the target). Detailed numbers go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persist compiled executables across bench/benchmark processes.

    Compiles dominate wall time on this 1-core host (tests/conftest.py has
    cached test compiles since round 2; bench and benchmarks/* recompiled
    every program every process until round 5). Shares the tests' cache dir.
    """
    import jax

    cache = os.path.join(os.path.dirname(__file__), "tests", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compile_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_time(traced_fn, chain=8, reps=7):
    """True per-call device time by differencing two chained programs.

    ``traced_fn(p)`` must accept a small traced float perturbation ``p`` that
    it adds to its input (defeats hoisting/CSE); each result feeds the next
    call's perturbation, so a chain of N calls serializes on device. Per-call
    time = (wall(chain=N) - wall(chain=1)) / (N - 1), which cancels both the
    ~40 ms tunnel dispatch and any fixed program overhead. (fori_loop-based
    timing is unusable here: each loop iteration syncs with the host through
    the tunnel, costing ~0.3 ms/iteration.)
    """
    import jax
    import jax.numpy as jnp

    from cudasift_tpu.utils.jit import tpu_compiler_options

    def make(n):
        def g():
            acc = jnp.float32(0)
            for _ in range(n):
                out = traced_fn(acc * jnp.float32(1e-30))
                # Fold EVERY output leaf into the chain: anything not in the
                # dependency chain gets dead-code-eliminated per iteration
                # and silently drops out of the measurement.
                for leaf in jax.tree.leaves(out):
                    acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
            return acc

        # The chain jit is the OUTERMOST compile here, so the TPU
        # scoped-vmem limit raise must ride on it (inner jits are inlined).
        return jax.jit(g, compiler_options=tpu_compiler_options())

    def wall(f):
        float(f())  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f())
            ts.append(time.perf_counter() - t0)
        # Minimum, not median: tenant noise on the shared chip is strictly
        # additive (contention only ever ADDS time), and it scales with the
        # program's device occupancy — so a median differential inflates the
        # long chain more than the short one and over-reads per-call time by
        # ~10-20% (round-5 tree A/B minima 4.56 ms vs the median protocol's
        # 5.62 at 1080p). The repo's own noise-canceling A/B protocol
        # (benchmarks/tree_ab.py, ROADMAP) already compares minima.
        return min(ts) * 1e3

    t1 = wall(make(1))
    tn = wall(make(chain))
    return max((tn - t1) / (chain - 1), 0.0)


def make_test_image(h, w, seed=0):
    """Benchmark input with realistic feature density.

    The reference benchmarks on real photographs (data/left.pgm, ~2k
    features at thresh 3-4.5); pure noise saturates every capacity and
    measures a pathological worst case. Resize the bundled fixture when
    available, else synthesize smoothed textured noise."""
    try:
        import cv2

        img = cv2.imread("/root/reference/data/left.pgm", 0)
        if img is not None:
            return cv2.resize(img.astype(np.float32), (w, h),
                              interpolation=cv2.INTER_AREA)
    except ImportError:
        pass
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    for _ in range(4):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1) + np.roll(img, -1, 0)) / 4
    blocks = rng.uniform(0, 255, (h // 32 + 1, w // 32 + 1)).astype(np.float32)
    img = 0.7 * img + 0.3 * np.kron(blocks, np.ones((32, 32), np.float32))[:h, :w]
    return img


def main():
    import jax
    import jax.numpy as jnp

    import cudasift_tpu as cs
    from cudasift_tpu.ops.pallas.match import match_descriptors_pallas

    dev = jax.devices()[0]
    log(f"device: {dev}")

    from cudasift_tpu.pipeline import _effective_params, _extract_sift_traced

    results = {}
    # Resolve refine_layout="auto" OUTSIDE the timing jit: the raw params
    # would re-trace the probe-rejected DMA tier inside device_time's chain
    # and crash on a strict Mosaic (this exact bypass killed BENCH_r03).
    params = _effective_params(
        cs.SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0,
                      max_pts=32768)
    )
    results["refine_layout"] = params.refine_layout
    log(f"refine layout: {params.refine_layout}")
    for (h, w) in [(960, 1280), (1080, 1920)]:
        img = jnp.asarray(make_test_image(h, w))
        d = cs.extract_sift(img, params)
        log(f"extract {w}x{h}: numPts={int(d.num_pts)}")
        # Two passes, report the min: the shared chip's tenant noise is
        # one-sided (contention only ever ADDS time), so the lower median
        # is the truer reading. Round-5 example of the spread: 5.6 vs 6.3
        # ms at 1080p across two runs an hour apart.
        ms = min(
            device_time(
                lambda p: _extract_sift_traced(img + p, params),
                chain=6, reps=11,
            )
            for _ in range(2)
        )
        results[f"extract_{w}x{h}_ms"] = ms
        log(f"extract {w}x{h}: {ms:.3f} ms")

    # Multi-frame throughput at 1280x960 (batch 4): real end-to-end rates
    # (walltime incl. dispatch — the number a video pipeline sees), vs the
    # single-frame rate measured the same way. Reference anchor: the demo's
    # 1000x amortized extraction loop (mainSift.cpp:65-70).
    import time as _time

    n_frames = 4
    frames = np.stack(
        [make_test_image(960, 1280, seed=i) for i in range(n_frames)]
    )
    for i in range(n_frames):
        frames[i] = np.roll(frames[i], 37 * i, axis=1)
    fj = jnp.asarray(frames)
    params_t = params

    def wall_rate(fn, frames_per_call, reps=15):
        fn()
        ts = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            fn()
            ts.append(_time.perf_counter() - t0)
        return frames_per_call / sorted(ts)[reps // 2]

    fps_1 = wall_rate(
        lambda: jax.block_until_ready(cs.extract_sift(fj[0], params_t)), 1)
    fps_n = wall_rate(
        lambda: jax.block_until_ready(
            cs.extract_sift_throughput(fj, params_t)), n_frames)
    results["throughput_1280x960_fps"] = fps_n
    log(f"throughput 1280x960: single {fps_1:.1f} fps, "
        f"batch({n_frames}) {fps_n:.1f} fps ({fps_n / fps_1:.2f}x)")

    # Matching: 2k x 2k realistic-size descriptor sets; 16k stress config.
    rng = np.random.default_rng(0)
    for n, tag in [(2048, "2k"), (16384, "16k")]:
        d1 = rng.standard_normal((n, 128)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 = rng.standard_normal((n, 128)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        j1, j2 = jnp.asarray(d1), jnp.asarray(d2)
        nn = jnp.int32(n)
        flops = 2.0 * n * n * 128
        ms = device_time(
            lambda p: match_descriptors_pallas(j1 + p, j2, nn, nn),
            chain=96 if n <= 4096 else 24, reps=11,
        )
        # Report the RAW measurement always; a synthetic MXU-physics floor
        # (200 TFLOP/s bf16) goes in a separate detail field so a suspect
        # differential under-measurement is visible without corrupting the
        # trend line (round-4 review finding).
        floor = max(0.01, flops / 200e12 * 1e3)
        if ms < floor:
            log(f"match {tag}: WARNING measured {ms:.4f} ms below physics "
                f"floor {floor:.4f} ms — raw value reported, floor noted")
            results[f"match_{tag}_floor_ms"] = floor
        results[f"match_{tag}_ms"] = ms
        gflops = flops / (max(ms, 1e-6) * 1e-3) / 1e9
        log(f"match {tag}x{tag}: {ms:.3f} ms ({gflops:.0f} GFLOPS)")

    # Match-quality envelope on the bundled pair (README.md:111-121 row
    # thresh 3.0: 1627 refined matches at 45.8%). Reference-style
    # accounting: trim the trailing full-res-octave duplicate block
    # (cudaSiftH.cu:115).
    try:
        import cv2

        left = cv2.imread("/root/reference/data/left.pgm", 0)
        righ = cv2.imread("/root/reference/data/righ.pgm", 0)
    except ImportError:
        left = righ = None
    if left is not None and righ is not None:
        params_q = params
        e1 = cs.extract_sift(jnp.asarray(left.astype(np.float32)), params_q)
        e2 = cs.extract_sift(jnp.asarray(righ.astype(np.float32)), params_q)
        e1 = cs.match_sift_data(e1, e2)
        Hq, nmq = cs.find_homography(
            e1, jax.random.PRNGKey(0), num_loops=10000, min_score=0.0,
            max_ambiguity=0.8, thresh=5.0)
        _, nfit, errq = cs.improve_homography(e1, Hq, 5, 0.0, 0.80, 3.0)

        r1 = cs.ref_style_num_pts(e1)
        r2 = cs.ref_style_num_pts(e2)
        nf_ref = int((np.asarray(errq)[:r1] < 3.0).sum())
        rate = 100.0 * nf_ref / min(r1, r2)
        results["numfit_thresh3"] = float(nf_ref)
        results["match_rate_thresh3_pct"] = rate
        log(f"quality thresh 3.0: numFit {nf_ref} at {rate:.1f}% "
            f"(reference table: 1627 at 45.8%)")

    primary = results["extract_1920x1080_ms"]
    out = {
        "metric": "extract_1920x1080_ms",
        "value": round(primary, 4),
        "unit": "ms",
        "vs_baseline": round(primary / 1.0, 4),
        "detail": {
            k: round(v, 4) if isinstance(v, float) else v
            for k, v in results.items()
        },
    }
    print(json.dumps(out))


def _run_with_retries():
    """Run the bench in fresh child processes, retrying transient failures.

    The shared-chip tunnel occasionally throws RESOURCE_EXHAUSTED or wedges
    mid-run; a fresh process is the only reliable retry (JAX caches the dead
    client). The child inherits stdout, so the JSON line reaches the driver
    directly. Attempts are bounded so a hard tunnel outage still fails
    within the driver's budget instead of hanging forever."""
    import subprocess

    for attempt in range(2):
        try:
            rc = subprocess.run(
                [sys.executable, __file__, "--child"], timeout=2100
            ).returncode
        except subprocess.TimeoutExpired:
            log(f"bench attempt {attempt + 1} timed out (tunnel wedged?)")
            rc = -1
        if rc == 0:
            return 0
        msg = f"bench attempt {attempt + 1} failed rc={rc}"
        log(msg + ("; retrying in a fresh process" if attempt == 0 else ""))
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    else:
        sys.exit(_run_with_retries())
