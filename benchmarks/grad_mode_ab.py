"""Interleaved A/B of the fused kernel's descriptor gradient modes.

Times orient_and_describe_pallas with mode in {exact, shift, fast} on the
bundled fixture's REAL per-octave keypoint distributions at 1080p (the scale
mix drives the small/large bucket split, which is what phase 4's cost rides
on). Protocol per CLAUDE.md: interleave device_time rounds of all modes in
one process, compare MINIMA (the shared chip's ±30% noise makes single runs
unusable).

Usage: python benchmarks/grad_mode_ab.py [--rounds N]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import device_time, make_test_image, log

from cudasift_tpu.config import SiftParams
from cudasift_tpu.pipeline import _effective_params, _extract_octave
from cudasift_tpu.ops import convolve
from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas


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

    # Real candidates per octave (post-refine compaction), captured eagerly.
    octs = []
    for o in range(params.num_octaves):
        cap = params.candidate_capacity(*bases[o].shape, o)
        # _extract_octave runs the full octave; instead reuse its front half
        # by calling the pieces directly.
        from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
        from cudasift_tpu.ops.detect import compact_mask
        from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas
        from cudasift_tpu.pipeline import _compact

        dog, mask = dog_and_mask_pallas(
            bases[o], params.laplace_kernels[o], params.thresh,
            params.edge_limit, raw=True)
        idx, cnt = compact_mask(mask, cap)
        xp, yp, sc, sh, ed, valid = refine_candidates_pallas(
            dog, idx, cnt, params.edge_limit, 0.0,
            logical_shape=bases[o].shape,
            lane8=params.refine_layout == "lane8")
        f0, live = _compact(
            {"xpos": xp, "ypos": yp, "scale": sc, "sharpness": sh,
             "edgeness": ed}, valid, cap)
        sc_safe = jnp.where(jnp.arange(cap) < live, f0["scale"], 1.0)
        octs.append((bases[o], f0["xpos"], f0["ypos"], sc_safe,
                     jnp.asarray(live)))
        log(f"octave {o}: {int(live)} live / cap {cap}")

    modes = ["exact", "shift", "fast"]
    mins = {m: 1e30 for m in modes}
    n_live = sum(int(o[4]) for o in octs)

    def run_all(mode):
        def fn(p):
            outs = []
            for base, x, y, s, live in octs:
                d1, d2, o1, o2, h2 = orient_and_describe_pallas(
                    base, x + p, y, s, count=live, mode=mode)
                outs.append(d1.reshape(-1)[0] + d2.reshape(-1)[0] + o1[0])
            return outs
        return fn

    for r in range(rounds):
        for m in modes:
            ms = device_time(run_all(m), chain=6, reps=7)
            mins[m] = min(mins[m], ms)
        log(f"round {r}: " + "  ".join(
            f"{m} {mins[m]:.3f}" for m in modes))

    log("---- minima (all 5 octaves, ms | ns per keypoint) ----")
    for m in modes:
        log(f"{m:6s} {mins[m]:7.3f} ms   {mins[m] * 1e6 / n_live:6.0f} ns/kp")

    # Quality probe: descriptor agreement vs exact on octave 0.
    base, x, y, s, live = octs[0]
    ref = orient_and_describe_pallas(base, x, y, s, count=live, mode="exact")
    nl = int(live)
    for m in ("shift", "fast"):
        out = orient_and_describe_pallas(base, x, y, s, count=live, mode=m)
        de, dm = np.asarray(ref[0])[:nl], np.asarray(out[0])[:nl]
        cos = (de * dm).sum(axis=1)
        log(f"{m}: desc cosine vs exact  min {cos.min():.4f}  "
            f"median {np.median(cos):.4f}")


if __name__ == "__main__":
    main()
