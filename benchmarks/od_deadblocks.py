"""Do the fused od kernel's DEAD capacity blocks cost anything?

The bucket table is capacity-sized (nc = cap + B): at 1080p thresh 3.0,
~110 of 321 blocks are live at o0 — the rest are count-gated by pl.when.
Gating skips the compute, but every grid step still pays its block DMAs
and scalar-core index maps. This measures the same kernel on the same
LIVE keypoints with (a) capacity-sized tables and (b) tight tables sliced
to the live blocks — interleaved chained-differential minima.

If (a) >> (b), capacity padding is NOT free and a tighter od table (or a
two-phase count-bounded dispatch) is the next extraction win.

Usage: python benchmarks/od_deadblocks.py [HxW] [--rounds N]
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
from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas
from cudasift_tpu.ops.pallas import orient_desc as od
from cudasift_tpu.pipeline import _effective_params
from cudasift_tpu.utils.jit import tpu_compiler_options

from od_context_ab import build_table, chained


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
    mode = params.grad_mode
    log(f"image {w}x{h}, device {jax.devices()[0]}, grad_mode {mode}")

    kernels = params.laplace_kernels
    lane8 = params.refine_layout != "pair"

    low = convolve.low_pass(img, max(params.init_blur, 0.001))
    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))

    cap_tables, tight_tables = [], []
    for o, base in enumerate(bases):
        cap = params.candidate_capacity(*base.shape, o)
        dog, mask = dog_and_mask_pallas(
            base, kernels[o], params.thresh, params.edge_limit, raw=True)
        idx, cnt = compact_mask(mask, cap)
        xp, yp, sc, sh, ed, valid = refine_candidates_pallas(
            dog, idx, cnt, params.edge_limit, 0.0,
            logical_shape=base.shape, lane8=lane8)
        tab = tuple(jax.block_until_ready(a) for a in build_table(
            base, xp, yp, jnp.where(valid, sc, 1.0), valid))
        img_t, bx, by, bs, margins, cnts = tab
        cnt_s, cs_pad, cnt_l = (int(c) for c in cnts)
        nc_tight = cs_pad + -(-cnt_l // od.B) * od.B
        nc_tight = max(nc_tight, od.B)
        cap_tables.append(tab)
        tight_tables.append((
            img_t, bx[:nc_tight], by[:nc_tight], bs[:nc_tight],
            margins[:nc_tight], cnts))
        log(f"octave {o}: cnts={[cnt_s, cs_pad, cnt_l]}, "
            f"blocks cap {bx.shape[0] // od.B} -> tight "
            f"{nc_tight // od.B}")

    def kern(tab, p):
        img_t, bx, by, bs, margins, cnts = tab
        d1, d2, meta = od._call_kernel(
            img_t, bx + p, by, bs, margins, cnts, False, mode)
        return d1.reshape(-1)[0] + d2.reshape(-1)[0] + meta.reshape(-1)[0]

    def f_cap(p):
        return [kern(t, p * jnp.float32(1e-30)) for t in cap_tables]

    def f_tight(p):
        return [kern(t, p * jnp.float32(1e-30)) for t in tight_tables]

    stages = [("cap", f_cap, 6), ("tight", f_tight, 6)]
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

    log("---- minima (ms) ----")
    for name, _, _, chain in compiled:
        m1, mn = mins[name]
        log(f"{name:6s} {max((mn - m1) / (chain - 1), 0.0):7.3f}")


if __name__ == "__main__":
    main()
