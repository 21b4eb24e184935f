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
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=30, warmup=5):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]


def make_test_image(h, w, seed=0):
    """Synthetic textured image with realistic feature density: smoothed
    noise + step edges, 0..255 range."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    # cheap separable smoothing to concentrate energy at SIFT scales
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1) + np.roll(img, -1, 0)) / 4
    blocks = rng.uniform(0, 255, (h // 32 + 1, w // 32 + 1)).astype(np.float32)
    img = 0.5 * img + 0.5 * np.kron(blocks, np.ones((32, 32), np.float32))[:h, :w]
    return img


def main():
    import jax
    import jax.numpy as jnp

    import cudasift_tpu as cs
    from cudasift_tpu.ops.match import match_descriptors

    dev = jax.devices()[0]
    log(f"device: {dev}")

    results = {}
    for (h, w) in [(960, 1280), (1080, 1920)]:
        img = jnp.asarray(make_test_image(h, w))
        params = cs.SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0,
                               max_pts=32768)
        t0 = time.perf_counter()
        d = cs.extract_sift(img, params)
        jax.block_until_ready(d.num_pts)
        log(f"extract {w}x{h}: compile {time.perf_counter()-t0:.1f}s, "
            f"numPts={int(d.num_pts)}")
        ms = time_fn(lambda im=img, p=params: cs.extract_sift(im, p))
        results[f"extract_{w}x{h}_ms"] = ms
        log(f"extract {w}x{h}: {ms:.3f} ms")

    # Matching: 2k x 2k realistic-size descriptor sets.
    rng = np.random.default_rng(0)
    for n, tag in [(2048, "2k"), (16384, "16k")]:
        d1 = rng.standard_normal((n, 128)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 = rng.standard_normal((n, 128)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        j1, j2 = jnp.asarray(d1), jnp.asarray(d2)
        nn = jnp.int32(n)
        fn = jax.jit(lambda a, b, x, y: match_descriptors(a, b, x, y, tile=2048))
        ms = time_fn(fn, j1, j2, nn, nn)
        results[f"match_{tag}_ms"] = ms
        gflops = 2 * n * n * 128 / (ms * 1e-3) / 1e9
        log(f"match {tag}x{tag}: {ms:.3f} ms ({gflops:.0f} GFLOPS)")

    primary = results["extract_1920x1080_ms"]
    out = {
        "metric": "extract_1920x1080_ms",
        "value": round(primary, 4),
        "unit": "ms",
        "vs_baseline": round(primary / 1.0, 4),
        "detail": {k: round(v, 4) for k, v in results.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
