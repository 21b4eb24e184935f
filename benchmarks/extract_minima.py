"""Interleaved-minima stage decomposition of TPU extraction.

The shared chip's ±30% run variance makes single device_time calls (and
medians across them) unusable for stage attribution — extract_profile.py
regularly reports 0.0 ms for one stage and 1.6 ms for an identical twin.
This script follows the repo's A/B protocol (CLAUDE.md): compile one chained
differential timer per stage ONCE, then interleave R rounds of wall
measurements across ALL stages and compare MINIMA, which estimates the
noise-free cost of each stage under the same conditions.

Each stage function runs its op for EVERY octave inside one traced chain, so
the number reported is the whole-pyramid cost of that stage.

Usage: python benchmarks/extract_minima.py [HxW] [--rounds N]
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
from cudasift_tpu.ops.detect import compact_mask
from cudasift_tpu.pipeline import (
    _compact, _effective_params, _extract_sift_traced,
)
from cudasift_tpu.utils.jit import tpu_compiler_options


def chained(traced_fn, n):
    """One jitted program running traced_fn n times serialized on device."""
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
    rounds = 6
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

    # Precompute per-octave inputs for the isolated stage chains.
    low = convolve.low_pass(img, max(params.init_blur, 0.001))
    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))
    kernels = params.laplace_kernels

    from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
    from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas
    from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas

    lane8 = params.refine_layout != "pair"
    octs = []
    for o in range(params.num_octaves):
        base = bases[o]
        cap = params.candidate_capacity(*base.shape, o)
        dog, mask = dog_and_mask_pallas(
            base, kernels[o], params.thresh, params.edge_limit, raw=True)
        idx, cnt = compact_mask(mask, cap)
        xp, yp, sc, sh, ed, valid = refine_candidates_pallas(
            dog, idx, cnt, params.edge_limit, 0.0,
            logical_shape=base.shape, lane8=lane8)
        f0, live = _compact(
            {"xpos": xp, "ypos": yp, "scale": sc}, valid, cap)
        octs.append(dict(
            base=base, cap=cap, dog=dog, mask=mask, idx=idx, cnt=cnt,
            xp=f0["xpos"], yp=f0["ypos"],
            sc=jnp.where(jnp.arange(cap) < live, f0["scale"], 1.0),
            live=live,
        ))
        log(f"octave {o}: cnt {int(cnt)} live {int(live)}")

    def st_total(p):
        return _extract_sift_traced(img + p, params)

    def st_preproc(p):
        low = convolve.low_pass(img + p, max(params.init_blur, 0.001))
        outs = [low.sum()]
        b = low
        for _ in range(params.num_octaves - 1):
            b = convolve.scale_down(b)
            outs.append(b.sum())
        return jnp.stack(outs)

    def st_dog(p):
        outs = []
        for o, d in enumerate(octs):
            dog, mask = dog_and_mask_pallas(
                d["base"] + p, kernels[o], params.thresh, params.edge_limit,
                raw=True)
            outs.append(dog.reshape(-1)[0] + mask.sum())
        return jnp.stack(outs)

    def st_compact(p):
        outs = []
        for d in octs:
            idx, cnt = compact_mask(d["mask"] ^ (p > 1e30), d["cap"])
            outs.append(idx[0] + cnt)
        return jnp.stack(outs)

    def st_refine(p):
        outs = []
        for d in octs:
            r = refine_candidates_pallas(
                d["dog"] + p, d["idx"], d["cnt"], params.edge_limit, 0.0,
                logical_shape=d["base"].shape, lane8=lane8)
            outs.append(r[0][0] + r[2][0])
        return jnp.stack(outs)

    def st_od(p):
        outs = []
        for d in octs:
            r = orient_and_describe_pallas(
                d["base"] + p, d["xp"], d["yp"], d["sc"], count=d["live"])
            outs.append(r[0].reshape(-1)[0] + r[2][0])
        return jnp.stack(outs)

    stages = [
        ("total", st_total, 6),
        ("preproc", st_preproc, 16),
        ("dog+mask", st_dog, 16),
        ("compact", st_compact, 16),
        ("refine", st_refine, 16),
        ("orient+desc", st_od, 8),
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

    log("---- minima (ms) ----")
    total = None
    ssum = 0.0
    for name, _, _, chain in compiled:
        m1, mn = mins[name]
        ms = max((mn - m1) / (chain - 1), 0.0)
        if name == "total":
            total = ms
        else:
            ssum += ms
        log(f"{name:12s} {ms:7.3f}")
    log(f"{'stage sum':12s} {ssum:7.3f}")
    if total is not None:
        log(f"{'glue (total - stages)':12s} {total - ssum:7.3f}")


if __name__ == "__main__":
    main()
