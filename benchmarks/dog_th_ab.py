"""Strip-height sweep for the fused blur+DoG+extrema stencil.

The kernel arithmetic is strip-height-agnostic: th only sets how many
output rows each program emits (and so the grid length, per-strip fixed
costs, and the VMEM working set ~38 arrays x th x wp). This sweeps th
over the 5 real octave bases at a given resolution, asserts bit-identical
outputs vs the default, and interleaves chained-differential minima.

od_context_ab.py established that isolated-kernel timing is representative
(no in-context effect) — so this times the stencil alone.

Usage: python benchmarks/dog_th_ab.py [HxW] [--rounds N]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_test_image, log

from cudasift_tpu.config import SiftParams
from cudasift_tpu.ops import convolve
from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
from cudasift_tpu.pipeline import _effective_params
from cudasift_tpu.utils.jit import tpu_compiler_options

from od_context_ab import chained


def main():
    shape = (1080, 1920)
    rounds = 4
    args = sys.argv[1:]
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i:i + 2]
    if args:
        h, w = args[0].split("x")
        shape = (int(h), int(w))
    h, w = shape

    params = _effective_params(
        SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0, max_pts=32768))
    img = jnp.asarray(make_test_image(h, w))
    log(f"image {w}x{h}, device {jax.devices()[0]}")

    kernels = params.laplace_kernels
    low = convolve.low_pass(img, max(params.init_blur, 0.001))
    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))

    # Parity: outputs must be bit-identical across th on every octave.
    ref = [dog_and_mask_pallas(b, kernels[o], params.thresh,
                               params.edge_limit, raw=False)
           for o, b in enumerate(bases)]
    cands = []
    for th in (8, 16, 24, 32):
        try:
            outs = [dog_and_mask_pallas(b, kernels[o], params.thresh,
                                        params.edge_limit, raw=False, th=th)
                    for o, b in enumerate(bases)]
            for o, ((d0, m0), (d1, m1)) in enumerate(zip(ref, outs)):
                np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
                np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
            cands.append(th)
            log(f"th={th}: compiles, bit-identical on all octaves")
        except Exception as e:  # Mosaic VMEM rejection etc.
            log(f"th={th}: REJECTED ({type(e).__name__}: {str(e)[:120]})")

    def run_th(th):
        def fn(p):
            outs = []
            for o, base in enumerate(bases):
                dog, mask = dog_and_mask_pallas(
                    base + p, kernels[o], params.thresh,
                    params.edge_limit, raw=True, th=th)
                outs.append(dog.reshape(-1)[0]
                            + mask.reshape(-1)[0].astype(jnp.float32))
            return outs
        return fn

    stages = [(f"th{th}", run_th(th), 8) for th in cands]
    compiled = []
    for name, fn, chain in stages:
        t0 = time.perf_counter()
        f1, fn_ = chained(fn, 1), chained(fn, chain)
        float(f1()), float(fn_())
        log(f"compiled {name} ({time.perf_counter() - t0:.0f}s)")
        compiled.append((name, f1, fn_, chain))

    reps = 7
    mins = {name: (1e30, 1e30) for name, *_ in compiled}
    for r in range(rounds):
        for name, f1, fn_, chain in compiled:
            def wall(f):
                ts = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    float(f())
                    ts.append(time.perf_counter() - t0)
                return sorted(ts)[reps // 2] * 1e3
            t1, tn = wall(f1), wall(fn_)
            m1, mn = mins[name]
            mins[name] = (min(m1, t1), min(mn, tn))
        log(f"round {r}: " + "  ".join(
            f"{name} "
            f"{max((mins[name][1] - mins[name][0]) / (chain - 1), 0.0):.3f}"
            for name, _, _, chain in compiled))

    log("---- minima (ms, all 5 octaves) ----")
    for name, _, _, chain in compiled:
        m1, mn = mins[name]
        log(f"{name:6s} {max((mn - m1) / (chain - 1), 0.0):7.3f}")


if __name__ == "__main__":
    main()
