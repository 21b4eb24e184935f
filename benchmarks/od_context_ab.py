"""Same-process A/B: is the fused od kernel really slower IN CONTEXT?

od_prefix.py attributes ~2.5 ms to the od pallas_call inside the full
pipeline, while grad_mode_ab.py measured the same kernel at ~1.2 ms
isolated — on a DIFFERENT day on a shared chip with ±30% tenant noise.
This script interleaves, in ONE process:

  A refine    the real prefix through refine (cumulative baseline)
  B dep       A + bucket build + kernel, kernel operands DEPENDENT on the
              prefix dataflow (exactly the pipeline's structure)
  C indep     A + the same kernel on EAGERLY PREBUILT constant operands
              (same table contents/counts) — in the same program but with
              no dataflow edge from the prefix
  D iso       the kernel on the prebuilt operands in its OWN program

B-A vs C-A separates dataflow/scheduling effects from co-residence;
C-A vs D separates co-residence from chip-of-the-day noise. All four are
chained-differential minima interleaved round-robin.

Usage: python benchmarks/od_context_ab.py [HxW] [--rounds N]
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
from cudasift_tpu.ops.scan import mask_cumsum, lane_stack
from cudasift_tpu.pipeline import _effective_params
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


def build_table(base, xpos, ypos, scale, live):
    """The wrapper preamble (orient_desc.py:931-977 + 801-845, single
    tile): returns (img_padded, bx, by, bs, margins, cnts)."""
    n = xpos.shape[0]
    ih, iw = base.shape
    xpos = jnp.clip(xpos, 0.0, float(iw - 1))
    ypos = jnp.clip(ypos, 0.0, float(ih - 1))
    img_t = jnp.pad(base, ((0, od._PAD_R), (0, od._PAD_C)), mode="edge")
    nc = n + od.B
    slots = jnp.arange(n)
    is_small = live & (scale <= od.SMALL_MAX_SCALE)
    is_large = live & jnp.logical_not(scale <= od.SMALL_MAX_SCALE)
    pos_s = mask_cumsum(is_small) - 1
    cnt_s = jnp.maximum(pos_s[-1] + 1, 0).astype(jnp.int32)
    pos_l = mask_cumsum(is_large) - 1
    cnt_l = jnp.maximum(pos_l[-1] + 1, 0).astype(jnp.int32)
    cs_pad = (cnt_s + od.B - 1) // od.B * od.B
    bucket_pos = jnp.where(
        is_small, pos_s, jnp.where(is_large, cs_pad + pos_l, nc))
    idx = jnp.zeros((nc,), jnp.int32).at[bucket_pos].set(slots, mode="drop")
    jpos = jnp.arange(nc)
    live_pos = ((jpos < cnt_s) | ((jpos >= cs_pad) & (jpos < cs_pad + cnt_l)))
    pts = lane_stack([xpos, ypos, scale])[idx]
    bx, by = pts[:, 0], pts[:, 1]
    bs = jnp.where(live_pos, pts[:, 2], 1.0)
    margins = jnp.where(jpos < cs_pad, od.GEOM_SMALL[2], od.GEOM_LARGE[2])
    cnts = jnp.stack([cnt_s, cs_pad, cnt_l])
    return img_t, bx, by, bs, margins, cnts


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
        SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0, max_pts=32768))
    img = jnp.asarray(make_test_image(h, w))
    mode = params.grad_mode
    log(f"image {w}x{h}, device {jax.devices()[0]}, "
        f"refine_layout {params.refine_layout}, grad_mode {mode}, "
        f"rounds {rounds}")

    kernels = params.laplace_kernels
    lane8 = params.refine_layout != "pair"

    def bases_of(p):
        low = convolve.low_pass(img + p, max(params.init_blur, 0.001))
        bases = [low]
        for _ in range(params.num_octaves - 1):
            bases.append(convolve.scale_down(bases[-1]))
        return bases

    def refined(p):
        out = []
        for o, base in enumerate(bases_of(p)):
            cap = params.candidate_capacity(*base.shape, o)
            dog, mask = dog_and_mask_pallas(
                base, kernels[o], params.thresh, params.edge_limit, raw=True)
            idx, cnt = compact_mask(mask, cap)
            xp, yp, sc, sh, ed, valid = refine_candidates_pallas(
                dog, idx, cnt, params.edge_limit, 0.0,
                logical_shape=base.shape, lane8=lane8)
            out.append((base, xp, yp, jnp.where(valid, sc, 1.0), valid))
        return out

    # Prebuild the per-octave kernel operands eagerly (concrete arrays).
    tables = []
    for base, xp, yp, sc, valid in refined(jnp.float32(0)):
        tables.append(tuple(
            jax.block_until_ready(a)
            for a in build_table(base, xp, yp, sc, valid)))
    for o, t in enumerate(tables):
        log(f"octave {o}: cnts={[int(c) for c in t[5]]}")

    def kernel_on(tab, p):
        img_t, bx, by, bs, margins, cnts = tab
        d1, d2, meta = od._call_kernel(
            img_t, bx + p, by, bs, margins, cnts, False, mode)
        return d1.reshape(-1)[0] + d2.reshape(-1)[0] + meta.reshape(-1)[0]

    def a_refine(p):
        return [r[1][0] + r[4][0] for r in refined(p)]

    def b_dep(p):
        outs = []
        for base, xp, yp, sc, valid in refined(p):
            tab = build_table(base, xp, yp, sc, valid)
            outs.append(kernel_on(tab, jnp.float32(0)))
        return outs

    def c_indep(p):
        outs = [r[1][0] + r[4][0] for r in refined(p)]
        for tab in tables:
            outs.append(kernel_on(tab, p * jnp.float32(1e-30)))
        return outs

    def d_iso(p):
        return [kernel_on(tab, p * jnp.float32(1e-30)) for tab in tables]

    stages = [
        ("A_refine", a_refine, 8),
        ("B_dep", b_dep, 6),
        ("C_indep", c_indep, 6),
        ("D_iso", d_iso, 6),
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
        vals = {name: max((mins[name][1] - mins[name][0]) / (chain - 1), 0.0)
                for name, _, _, chain in compiled}
        log(f"round {r}: " + "  ".join(
            f"{k} {v:.3f}" for k, v in vals.items()))

    vals = {name: max((mins[name][1] - mins[name][0]) / (chain - 1), 0.0)
            for name, _, _, chain in compiled}
    log("---- minima (ms) ----")
    for k, v in vals.items():
        log(f"{k:9s} {v:7.3f}")
    log(f"kernel in-context DEPENDENT   (B-A): "
        f"{vals['B_dep'] - vals['A_refine']:.3f}")
    log(f"kernel in-context INDEPENDENT (C-A): "
        f"{vals['C_indep'] - vals['A_refine']:.3f}")
    log(f"kernel ISOLATED               (D):   {vals['D_iso']:.3f}")


if __name__ == "__main__":
    main()
