"""Interleaved A/B of the fused orient+descriptor kernel: git revision vs
working tree, on the fixture's real 1080p keypoint mix.

Measures the round-5 block-wide phase-2/4 restructure (one (P, B*PW) patch
stack + shared rolls; block-wide shift fields; one-hot MXU tent expansion;
fused gx/gy group matmuls) against the committed per-group kernel. Also
probes descriptor agreement between the two trees per mode (the restructure
is value-preserving up to matmul-fusion rounding, so cosines must be ~1).

Usage: python benchmarks/od_kernel_ab.py [--rounds N] [--ref REV] [--modes m1,m2]
"""

from __future__ import annotations

import subprocess
import sys
import types

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from bench import device_time, make_test_image, log

from cudasift_tpu.config import SiftParams
from cudasift_tpu.pipeline import _effective_params, _compact
from cudasift_tpu.ops import convolve


def load_old(rev: str):
    src = subprocess.check_output(
        ["git", "-C", "/root/repo", "show",
         f"{rev}:cudasift_tpu/ops/pallas/orient_desc.py"], text=True)
    mod = types.ModuleType("od_ab_old")
    mod.__dict__["__name__"] = "od_ab_old"
    mod.__dict__["__package__"] = "cudasift_tpu.ops.pallas"
    exec(compile(src, "od_ab_old.py", "exec"), mod.__dict__)
    return mod.orient_and_describe_pallas


def main():
    rounds = 5
    rev = "HEAD"
    modes = ["shift", "exact"]
    argv = sys.argv[1:]
    if "--rounds" in argv:
        rounds = int(argv[argv.index("--rounds") + 1])
    if "--ref" in argv:
        rev = argv[argv.index("--ref") + 1]
    if "--modes" in argv:
        modes = argv[argv.index("--modes") + 1].split(",")
    old_fn = load_old(rev)
    from cudasift_tpu.ops.pallas.orient_desc import (
        orient_and_describe_pallas as new_fn)

    params = _effective_params(
        SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0, max_pts=32768))
    img = jnp.asarray(make_test_image(1080, 1920))
    low = convolve.low_pass(img, max(params.init_blur, 0.001))
    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))

    from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
    from cudasift_tpu.ops.detect import compact_mask
    from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas

    octs = []
    for o in range(params.num_octaves):
        cap = params.candidate_capacity(*bases[o].shape, o)
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
    n_live = sum(int(o[4]) for o in octs)

    # Agreement probe on octave 0 before timing.
    base, x, y, s, live = octs[0]
    nl = int(live)
    for mode in modes:
        a = old_fn(base, x, y, s, count=live, mode=mode)
        b = new_fn(base, x, y, s, count=live, mode=mode)
        da, db = np.asarray(a[0])[:nl], np.asarray(b[0])[:nl]
        cos = (da * db).sum(axis=1)
        do = np.abs(np.asarray(a[2])[:nl] - np.asarray(b[2])[:nl])
        do = np.minimum(do, 360.0 - do)
        log(f"{mode}: old-vs-new desc cos min {cos.min():.6f} "
            f"median {np.median(cos):.6f}; ori maxdiff {do.max():.2e} deg")
        assert cos.min() > 0.999, cos.min()
        assert do.max() < 0.01, do.max()

    variants = []
    for mode in modes:
        for name, fn in (("old", old_fn), ("new", new_fn)):
            def run(fn=fn, mode=mode):
                def f(p):
                    outs = []
                    for base, x, y, s, live in octs:
                        d1, d2, o1, o2, h2 = fn(
                            base, x + p, y, s, count=live, mode=mode)
                        outs.append(d1.reshape(-1)[0] + d2.reshape(-1)[0]
                                    + o1[0])
                    return outs
                return f
            variants.append((f"{mode}-{name}", run()))

    mins = {name: 1e30 for name, _ in variants}
    for r in range(rounds):
        for name, fn in variants:
            ms = device_time(fn, chain=6, reps=7)
            mins[name] = min(mins[name], ms)
        log(f"round {r}: " + "  ".join(
            f"{name} {mins[name]:.3f}" for name, _ in variants))

    log("---- minima (all 5 octaves, ms | ns/kp) ----")
    for name, _ in variants:
        log(f"{name:12s} {mins[name]:7.3f} ms   "
            f"{mins[name] * 1e6 / n_live:6.0f} ns/kp")


if __name__ == "__main__":
    main()
