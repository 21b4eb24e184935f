"""Multi-frame throughput vs single-frame latency on TPU.

The reference demo amortizes per-call overhead with a 1000x extraction loop
over a shared temp arena (mainSift.cpp:65-70). The TPU throughput mode
batches N frames into one program; this bench measures real end-to-end
rates (walltime including dispatch, the number a video pipeline sees) and
the device-only per-frame time (chained differential) for both modes.

Usage: python benchmarks/throughput_bench.py [N]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import device_time, make_test_image, log

import cudasift_tpu as cs


def wall_rate(fn, frames_per_call, reps=15):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[reps // 2]
    return frames_per_call / med, med * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h, w = 960, 1280
    from cudasift_tpu.pipeline import _effective_params

    params = _effective_params(
        cs.SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0,
                      max_pts=32768)
    )
    frames = np.stack([make_test_image(h, w, seed=i) for i in range(n)])
    # Distinct contents per frame: shift crops so counts differ.
    for i in range(n):
        frames[i] = np.roll(frames[i], 37 * i, axis=1)
    fj = jnp.asarray(frames)
    f0 = fj[0]

    d = cs.extract_sift(f0, params)
    log(f"single numPts={int(d.num_pts)}")
    b = cs.extract_sift_throughput(fj, params)
    log(f"batch({n}) numPts={[int(x) for x in b.num_pts]}")

    fps_1, ms_1 = wall_rate(
        lambda: jax.block_until_ready(cs.extract_sift(f0, params)), 1)
    log(f"single-frame wall: {ms_1:.2f} ms/call -> {fps_1:.1f} fps")
    fps_n, ms_n = wall_rate(
        lambda: jax.block_until_ready(cs.extract_sift_throughput(fj, params)),
        n)
    log(f"batch({n}) wall:   {ms_n:.2f} ms/call -> {fps_n:.1f} fps "
        f"({fps_n / fps_1:.2f}x single)")

    from cudasift_tpu.pipeline import _extract_sift_traced, _extract_batch_jit

    dev_1 = device_time(lambda p: _extract_sift_traced(f0 + p, params),
                        chain=6, reps=9)

    def batch_all(p):
        # Reduce over the batch axis so EVERY frame feeds the timing chain —
        # device_time folds only leaf[0], and a stacked output's element 0
        # depends on frame 0 alone (XLA would DCE the other frames).
        out = _extract_batch_jit(fj + p, params)
        return jax.tree.map(lambda x: jnp.sum(x, axis=0), out)

    dev_n = device_time(batch_all, chain=4, reps=9)
    log(f"device-only: single {dev_1:.3f} ms/frame, "
        f"batch {dev_n / n:.3f} ms/frame ({dev_1 / (dev_n / n):.2f}x)")


if __name__ == "__main__":
    main()
