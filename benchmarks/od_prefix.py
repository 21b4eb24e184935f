"""In-context sub-decomposition of the fused orient+descriptor STAGE.

extract_prefix.py attributes ~3.0 ms of the 1080p extraction to the od
stage while the isolated interleaved A/B measures the same kernels at
~1.2 ms (ROADMAP round-5 table). This script splits the od stage — in
context, after the real dog/compact/refine prefix — into three cuts:

  +od_prep    wrapper preamble: clip, per-tile edge-pad image copy,
              scale-bucket build (2x mask_cumsum, scatter of slots,
              lane_stack row gather of the keypoint table)
  +od_kernel  + the Pallas two-geometry kernel itself (_call_kernel)
  +od (full)  + unpack (lane permute, has2 mask) and the table->slot
              gather-back

Consecutive deltas attribute the stage's in-context cost to wrapper glue
vs kernel vs scatter-back. Protocol identical to extract_prefix.py
(chained differential, median-of-7 walls, cross-round minima).

Usage: python benchmarks/od_prefix.py [HxW] [--rounds N]
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
        f"refine_layout {params.refine_layout}, grad_mode {params.grad_mode}, "
        f"rounds {rounds}")

    kernels = params.laplace_kernels
    lane8 = params.refine_layout != "pair"
    mode = params.grad_mode

    def bases_of(p):
        low = convolve.low_pass(img + p, max(params.init_blur, 0.001))
        bases = [low]
        for _ in range(params.num_octaves - 1):
            bases.append(convolve.scale_down(bases[-1]))
        return bases

    def refined(p):
        """The real prefix up to refine, per octave."""
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

    def od_prep_one(base, xpos, ypos, scale, live, *, run_kernel):
        """Replicates orient_and_describe_pallas + _run_table up to (and
        optionally including) _call_kernel, returning leaves that keep the
        whole preamble live. Mirrors orient_desc.py:931-977/801-845."""
        n_in = xpos.shape[0]
        pad = (-n_in) % od.B
        if pad:
            xpos, ypos, scale = (
                jnp.pad(a, (0, pad)) for a in (xpos, ypos, scale))
            scale = scale.at[n_in:].set(1.0)
            live = jnp.pad(live, (0, pad))
        n = xpos.shape[0]
        ih, iw = base.shape
        n_tiles = od.fused_tiles(ih, iw)
        xpos = jnp.clip(xpos, 0.0, float(iw - 1))
        ypos = jnp.clip(ypos, 0.0, float(ih - 1))
        step = -(-ih // n_tiles)
        leaves = []
        for t in range(n_tiles):
            y0 = t * step
            y1 = min(ih, (t + 1) * step)
            y0e = max(y0 - od._TILE_TOP, 0)
            img_t = jnp.pad(
                base[y0e: min(y1 + od._TILE_BOT, ih)],
                ((0, od._PAD_R), (0, od._PAD_C)), mode="edge",
            )
            live_t = (live & (ypos >= y0) & (ypos < y1)
                      if n_tiles > 1 else live)
            yloc = ypos - y0e
            nc = n + od.B
            slots = jnp.arange(n)
            is_small = live_t & (scale <= od.SMALL_MAX_SCALE)
            is_large = live_t & jnp.logical_not(scale <= od.SMALL_MAX_SCALE)
            pos_s = mask_cumsum(is_small) - 1
            cnt_s = jnp.maximum(pos_s[-1] + 1, 0).astype(jnp.int32)
            pos_l = mask_cumsum(is_large) - 1
            cnt_l = jnp.maximum(pos_l[-1] + 1, 0).astype(jnp.int32)
            cs_pad = (cnt_s + od.B - 1) // od.B * od.B
            bucket_pos = jnp.where(
                is_small, pos_s, jnp.where(is_large, cs_pad + pos_l, nc))
            idx = jnp.zeros((nc,), jnp.int32).at[bucket_pos].set(
                slots, mode="drop")
            jpos = jnp.arange(nc)
            live_pos = ((jpos < cnt_s)
                        | ((jpos >= cs_pad) & (jpos < cs_pad + cnt_l)))
            pts = lane_stack([xpos, yloc, scale])[idx]
            bx, by = pts[:, 0], pts[:, 1]
            bs = jnp.where(live_pos, pts[:, 2], 1.0)
            margins = jnp.where(
                jpos < cs_pad, od.GEOM_SMALL[2], od.GEOM_LARGE[2])
            cnts = jnp.stack([cnt_s, cs_pad, cnt_l])
            if run_kernel:
                d1, d2, meta = od._call_kernel(
                    img_t, bx, by, bs, margins, cnts, False, mode)
                leaves += [d1.reshape(-1)[0], d2.reshape(-1)[0],
                           meta.reshape(-1)[0]]
            else:
                leaves += [img_t.reshape(-1)[0], bx[0] + by[0] + bs[0],
                           bucket_pos.sum(), margins[0] + cnts[0]]
        return leaves

    def p_refine(p):
        return [r[1][0] + r[4][0] for r in refined(p)]

    def p_prep(p):
        outs = []
        for base, xp, yp, sc, valid in refined(p):
            outs += od_prep_one(base, xp, yp, sc, valid, run_kernel=False)
        return outs

    def p_kernel(p):
        outs = []
        for base, xp, yp, sc, valid in refined(p):
            outs += od_prep_one(base, xp, yp, sc, valid, run_kernel=True)
        return outs

    def p_od(p):
        outs = []
        for base, xp, yp, sc, valid in refined(p):
            d1, d2, pri, sec, has2 = od.orient_and_describe_pallas(
                base, xp, yp, sc, live=valid, mode=mode)
            outs.append(d1.reshape(-1)[0] + d2.reshape(-1)[0]
                        + pri[0] + sec[0])
        return outs

    stages = [
        ("+refine", p_refine, 8),
        ("+od_prep", p_prep, 8),
        ("+od_kernel", p_kernel, 6),
        ("+od", p_od, 6),
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
        log(f"{name:11s} {ms:7.3f}   (+{ms - prev:7.3f})")
        prev = ms


if __name__ == "__main__":
    main()
