"""Cumulative-prefix decomposition of extraction IN CONTEXT.

glue_minima.py showed the assembly/merge glue costs ~0.05 ms, yet the 1080p
total (7.3 ms) exceeds the isolated-stage sum (~3.6 ms) by miles — the gap
lives in stage INTERACTIONS (inter-stage relayouts, scheduling, layouts
chosen differently when stages are fused into one program). This script
times cumulative prefixes of the REAL pipeline dataflow — preproc, +dog,
+compact, +refine, +postcompact, +orient/desc, full — with the interleaved-
minima protocol; consecutive differences attribute cost where isolated
stage timing cannot.

Usage: python benchmarks/extract_prefix.py [HxW] [--rounds N]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import make_test_image, log

from cudasift_tpu.config import SiftParams
from cudasift_tpu.ops import convolve
from cudasift_tpu.ops.detect import compact_mask
from cudasift_tpu.pipeline import (
    _effective_params, _extract_sift_traced,
)
from cudasift_tpu.utils.jit import tpu_compiler_options


def chained(traced_fn, n):
    def g():
        acc = jnp.float32(0)
        for _ in range(n):
            out = traced_fn(acc * jnp.float32(1e-30))
            for leaf in jax.tree.leaves(out):
                acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
        return acc
    return jax.jit(g, compiler_options=tpu_compiler_options())


def main():
    shape = (1080, 1920)
    rounds = 5
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
        SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0, max_pts=32768)
    )
    img = jnp.asarray(make_test_image(h, w))
    log(f"image {w}x{h}, device {jax.devices()[0]}, "
        f"refine_layout {params.refine_layout}, rounds {rounds}")

    from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
    from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas
    from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas

    kernels = params.laplace_kernels
    lane8 = params.refine_layout != "pair"

    # Each prefix function recomputes the real dataflow from the image up to
    # its cut point, returning just enough leaves to keep everything live.
    def bases_of(p):
        low = convolve.low_pass(img + p, max(params.init_blur, 0.001))
        bases = [low]
        for _ in range(params.num_octaves - 1):
            bases.append(convolve.scale_down(bases[-1]))
        return bases

    def p_preproc(p):
        return [b.sum() for b in bases_of(p)]

    def p_dog(p):
        outs = []
        for o, base in enumerate(bases_of(p)):
            dog, mask = dog_and_mask_pallas(
                base, kernels[o], params.thresh, params.edge_limit, raw=True)
            outs.append(dog.reshape(-1)[0] + mask.reshape(-1)[0])
        return outs

    def p_compact(p):
        outs = []
        for o, base in enumerate(bases_of(p)):
            cap = params.candidate_capacity(*base.shape, o)
            dog, mask = dog_and_mask_pallas(
                base, kernels[o], params.thresh, params.edge_limit, raw=True)
            idx, cnt = compact_mask(mask, cap)
            outs.append(dog.reshape(-1)[0] + idx.sum() + cnt)
        return outs

    def p_refine(p):
        outs = []
        for o, base in enumerate(bases_of(p)):
            cap = params.candidate_capacity(*base.shape, o)
            dog, mask = dog_and_mask_pallas(
                base, kernels[o], params.thresh, params.edge_limit, raw=True)
            idx, cnt = compact_mask(mask, cap)
            r = refine_candidates_pallas(
                dog, idx, cnt, params.edge_limit, 0.0,
                logical_shape=base.shape, lane8=lane8)
            outs.append(r[0][0] + r[2][0] + r[5][0])
        return outs

    def p_od(p):
        # Matches the round-5 pipeline: refine's validity mask feeds the
        # fused kernel directly (no stable-compact in between).
        outs = []
        for o, base in enumerate(bases_of(p)):
            cap = params.candidate_capacity(*base.shape, o)
            dog, mask = dog_and_mask_pallas(
                base, kernels[o], params.thresh, params.edge_limit, raw=True)
            idx, cnt = compact_mask(mask, cap)
            xp, yp, sc, sh, ed, valid = refine_candidates_pallas(
                dog, idx, cnt, params.edge_limit, 0.0,
                logical_shape=base.shape, lane8=lane8)
            sc_safe = jnp.where(valid, sc, 1.0)
            d1, d2, pri, sec, has2 = orient_and_describe_pallas(
                base, xp, yp, sc_safe, live=valid,
                mode=params.grad_mode)
            outs.append(d1.reshape(-1)[0] + d2.reshape(-1)[0] + pri[0]
                        + sec[0])
        return outs

    def p_full(p):
        return _extract_sift_traced(img + p, params)

    stages = [
        ("preproc", p_preproc, 16),
        ("+dog", p_dog, 8),
        ("+compact", p_compact, 8),
        ("+refine", p_refine, 8),
        ("+od", p_od, 6),
        ("full", p_full, 6),
    ]

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
            f"{name} {max((mins[name][1] - mins[name][0]) / (chain - 1), 0.0):.3f}"
            for name, _, _, chain in compiled))

    log("---- cumulative minima (ms) and deltas ----")
    prev = 0.0
    for name, _, _, chain in compiled:
        m1, mn = mins[name]
        ms = max((mn - m1) / (chain - 1), 0.0)
        log(f"{name:10s} {ms:7.3f}   (+{ms - prev:7.3f})")
        prev = ms


if __name__ == "__main__":
    main()
