"""In-context decomposition of compact_mask (+0.90 ms at 1080p, round-5
extract_prefix attribution — 13% of the frame for a stage whose ISOLATED
minima measured 0.078 ms in round 3).

Times cumulative cuts of the compaction, each downstream of the real DoG
stencil for all five octaves: (a) mask -> int8 chunk pyramid, (b) + top
rank, (c) + level-1 descent, (d) + level-0 descent (= full compact_mask).
Consecutive deltas attribute the cost between the mask conversion passes,
the pyramid sums, and the two (capacity, 512) row-gather descents.

Usage: python benchmarks/compact_decomp.py [--rounds N]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import device_time, make_test_image, log

from cudasift_tpu.config import SiftParams
from cudasift_tpu.ops import convolve
from cudasift_tpu.pipeline import _effective_params


def main():
    rounds = 5
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])

    params = _effective_params(
        SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0, max_pts=32768))
    img = jnp.asarray(make_test_image(1080, 1920))
    low = convolve.low_pass(img, max(params.init_blur, 0.001))
    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))
    kernels = params.laplace_kernels
    caps = [params.candidate_capacity(*bases[o].shape, o) for o in range(5)]
    log(f"caps: {caps}, device {jax.devices()[0]}")

    from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas

    radix = 512

    def masks_of(p):
        outs = []
        for o in range(5):
            dog, mask = dog_and_mask_pallas(
                bases[o] + p, kernels[o], params.thresh, params.edge_limit,
                raw=True)
            outs.append((dog, mask))
        return outs

    def cut(mask, capacity, stage):
        flat = mask.reshape(-1)
        n = flat.shape[0]
        pad = (-n) % radix
        if pad:
            flat = jnp.pad(flat, (0, pad))
        levels = []
        cur = flat.astype(jnp.int8).reshape(-1, radix)
        levels.append(cur)
        sums = cur.sum(axis=1, dtype=jnp.int32)
        while sums.shape[0] > radix:
            spad = (-sums.shape[0]) % radix
            if spad:
                sums = jnp.pad(sums, (0, spad))
            cur = sums.reshape(-1, radix)
            levels.append(cur)
            sums = cur.sum(axis=1)
        top = sums
        top_cum = jnp.cumsum(top)
        total = top_cum[-1]
        if stage == "pyramid":
            return total + levels[0][0, 0].astype(jnp.int32)
        targets = jnp.arange(1, capacity + 1, dtype=jnp.int32)
        below = top_cum[None, :] < targets[:, None]
        node = below.sum(axis=1).astype(jnp.int32)
        start = jnp.sum(jnp.where(below, top[None, :], 0), axis=1)
        if stage == "toprank":
            return node.sum() + start.sum() + total
        use = levels[::-1] if stage == "full" else levels[1:][::-1]
        for lvl in use:
            rows = lvl[node].astype(jnp.int32)
            cum = jnp.cumsum(rows, axis=1)
            rank = (targets - start)[:, None]
            below = cum < rank
            loc = below.sum(axis=1).astype(jnp.int32)
            start = start + jnp.sum(jnp.where(below, rows, 0), axis=1)
            node = node * radix + loc
        return node.sum() + total

    def make(stage):
        def fn(p):
            outs = []
            for o, (dog, mask) in enumerate(masks_of(p)):
                r = cut(mask, caps[o], stage)
                outs.append(dog.reshape(-1)[0] + r.astype(jnp.float32))
            return outs
        return fn

    stages = ["dogonly", "pyramid", "toprank", "lvl1", "full"]

    def fn_for(s):
        if s == "dogonly":
            def fn(p):
                return [d.reshape(-1)[0] + m.reshape(-1)[0].astype(
                    jnp.float32) for d, m in masks_of(p)]
            return fn
        return make(s)

    mins = {s: 1e30 for s in stages}
    for r in range(rounds):
        for s in stages:
            ms = device_time(fn_for(s), chain=6, reps=7)
            mins[s] = min(mins[s], ms)
        log(f"round {r}: " + "  ".join(f"{s} {mins[s]:.3f}" for s in stages))

    log("---- cumulative minima (ms) and deltas ----")
    prev = 0.0
    for s in stages:
        log(f"{s:10s} {mins[s]:7.3f}   (+{mins[s] - prev:7.3f})")
        prev = mins[s]


if __name__ == "__main__":
    main()
