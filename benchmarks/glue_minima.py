"""Interleaved-minima decomposition of the XLA GLUE in extraction.

extract_minima.py attributes the five kernel stages; the 1080p total still
exceeds their sum by several ms (round-4 reading: 8.36 total vs 3.58 stage
sum). This script times the remaining non-kernel work on realistic
intermediates — the per-octave post-refine compaction, the per-octave
dup/concat field assembly, and the final cross-octave merge compaction +
padding — under the same interleaved-minima protocol (CLAUDE.md), so the
gap can be attacked where it actually is instead of where it is presumed.

Usage: python benchmarks/glue_minima.py [HxW] [--rounds N]
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
            {"xpos": xp, "ypos": yp, "scale": sc, "sharpness": sh,
             "edgeness": ed}, valid, cap)
        sc_safe = jnp.where(jnp.arange(cap) < live, f0["scale"], 1.0)
        d1, d2, pri, sec, has2 = orient_and_describe_pallas(
            base, f0["xpos"], f0["ypos"], sc_safe, count=live)
        octs.append(dict(
            base=base, cap=cap,
            xp=xp, yp=yp, sc=sc, sh=sh, ed=ed, valid=valid,
            f0=f0, live=live,
            d1=d1, d2=d2, pri=pri, sec=sec, has2=has2,
            sub=float(2 ** o),
        ))
        log(f"octave {o}: cap {cap} live {int(live)}")

    def st_total(p):
        return _extract_sift_traced(img + p, params)

    # Per-octave post-refine compaction of the 5 scalar fields (the step
    # between the refine kernel and the fused orient+desc kernel).
    def st_postcompact(p):
        outs = []
        for d in octs:
            f0, live = _compact(
                {"xpos": d["xp"] + p, "ypos": d["yp"], "scale": d["sc"],
                 "sharpness": d["sh"], "edgeness": d["ed"]},
                d["valid"], d["cap"])
            outs.append(sum(v.sum() for v in f0.values()) + live)
        return jnp.stack(outs)

    # Per-octave field assembly: dup/concat of the 6 scalar fields + the
    # (2cap, 128) descriptor concat + slot_valid (pipeline.py:289-301).
    def st_assemble(p):
        outs = []
        for d in octs:
            f0, live = d["f0"], d["live"]
            valid = jnp.arange(d["cap"]) < live

            def dup(a, b=None):
                return jnp.concatenate([a, a if b is None else b])

            fields = {
                "xpos": dup(f0["xpos"] + p) * d["sub"],
                "ypos": dup(f0["ypos"]) * d["sub"],
                "scale": dup(f0["scale"]) * d["sub"],
                "sharpness": dup(f0["sharpness"]),
                "edgeness": dup(f0["edgeness"]),
                "orientation": dup(d["pri"], d["sec"]),
                "data": jnp.concatenate([d["d1"], d["d2"]]),
            }
            slot_valid = jnp.concatenate([valid, valid & d["has2"]])
            fields["subsampling"] = jnp.where(slot_valid, d["sub"], 0.0)
            outs.append(sum(v.sum() for v in fields.values()) + slot_valid.sum())
        return jnp.stack(outs)

    # The final cross-octave merge: concat everything, one global _compact
    # at cap_eff, pad to max_pts (pipeline.py:374-397).
    pre = []
    for d in octs:
        f0, live = d["f0"], d["live"]
        valid = jnp.arange(d["cap"]) < live

        def dup(a, b=None):
            return jnp.concatenate([a, a if b is None else b])

        pre.append((
            {
                "xpos": dup(f0["xpos"]), "ypos": dup(f0["ypos"]),
                "scale": dup(f0["scale"]), "sharpness": dup(f0["sharpness"]),
                "edgeness": dup(f0["edgeness"]),
                "orientation": dup(d["pri"], d["sec"]),
                "subsampling": jnp.full((2 * d["cap"],), d["sub"]),
                "data": jnp.concatenate([d["d1"], d["d2"]]),
            },
            jnp.concatenate([valid, valid & d["has2"]]),
        ))

    def st_merge(p):
        all_fields = [dict(f, xpos=f["xpos"] + p) for f, _ in pre]
        merged = {
            k: jnp.concatenate([f[k] for f in all_fields])
            for k in all_fields[0]
        }
        valid = jnp.concatenate([v for _, v in pre])
        total_slots = valid.shape[0]
        cap_eff = min(params.max_pts, (total_slots + 127) // 128 * 128)
        merged, num_pts = _compact(merged, valid, cap_eff)
        if cap_eff < params.max_pts:
            pad = params.max_pts - cap_eff
            merged = {
                k: jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
                for k, v in merged.items()
            }
        return sum(v.sum() for v in merged.values()) + num_pts

    stages = [
        ("total", st_total, 6),
        ("postcompact", st_postcompact, 16),
        ("assemble", st_assemble, 16),
        ("merge", st_merge, 16),
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
    for name, _, _, chain in compiled:
        m1, mn = mins[name]
        ms = max((mn - m1) / (chain - 1), 0.0)
        log(f"{name:12s} {ms:7.3f}")


if __name__ == "__main__":
    main()
