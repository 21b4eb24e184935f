"""Interleaved in-context A/B: compact_mask descent via integer lane
cumsum (old, from git) vs MXU triangular matmul (new, working tree).

The descent's per-level ``jnp.cumsum(rows, axis=1)`` over (capacity, radix)
int32 is pure VPU shift-add work; levels 0 and 1 carry integer entries
<= 256, which are exact in a bf16 operand, so a (cap, radix) @ (radix, radix)
triangular matmul computes the identical cumsum on the MXU. Times the full
dog -> compact prefix for all five 1080p octaves, interleaved minima, after
asserting bit-identical indices on the real octave masks.

Usage: python benchmarks/compact_mxu_ab.py [--rounds N] [--ref REV]
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
from cudasift_tpu.ops import convolve
from cudasift_tpu.ops.detect import compact_mask as compact_new
from cudasift_tpu.pipeline import _effective_params


def load_old(rev: str):
    src = subprocess.check_output(
        ["git", "-C", "/root/repo", "show", f"{rev}:cudasift_tpu/ops/detect.py"],
        text=True,
    )
    mod = types.ModuleType("detect_old")
    mod.__dict__["__name__"] = "detect_old"
    mod.__dict__["__package__"] = "cudasift_tpu.ops"
    exec(compile(src, "detect_old.py", "exec"), mod.__dict__)
    return mod.compact_mask


def main():
    rounds = 5
    rev = "HEAD"
    argv = sys.argv[1:]
    if "--rounds" in argv:
        rounds = int(argv[argv.index("--rounds") + 1])
    if "--ref" in argv:
        rev = argv[argv.index("--ref") + 1]
    compact_old = load_old(rev)

    params = _effective_params(
        SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0, max_pts=32768))
    img = jnp.asarray(make_test_image(1080, 1920))
    low = convolve.low_pass(img, max(params.init_blur, 0.001))
    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))
    kernels = params.laplace_kernels
    caps = [params.candidate_capacity(*bases[o].shape, o) for o in range(5)]

    from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas

    # Correctness: identical indices on the real masks.
    for o in range(5):
        _, mask = dog_and_mask_pallas(
            bases[o], kernels[o], params.thresh, params.edge_limit, raw=True)
        io_, co_ = compact_old(mask, caps[o])
        in_, cn_ = compact_new(mask, caps[o])
        np.testing.assert_array_equal(np.asarray(io_), np.asarray(in_))
        assert int(co_) == int(cn_)
    log("old and new descents agree bit-for-bit on the five real masks")

    def make(compact):
        def fn(p):
            outs = []
            for o in range(5):
                dog, mask = dog_and_mask_pallas(
                    bases[o] + p, kernels[o], params.thresh,
                    params.edge_limit, raw=True)
                idx, cnt = compact(mask, caps[o])
                outs.append(dog.reshape(-1)[0] + idx.sum() + cnt)
            return outs
        return fn

    variants = [("old", make(compact_old)), ("new", make(compact_new))]
    mins = {name: 1e30 for name, _ in variants}
    for rd in range(rounds):
        for name, fn in variants:
            ms = device_time(fn, chain=8, reps=7)
            mins[name] = min(mins[name], ms)
        log(f"round {rd}: " + "  ".join(
            f"{name} {mins[name]:.3f}" for name, _ in variants))
    log("---- minima (dog + compact, all five octaves, ms) ----")
    for name, _ in variants:
        log(f"{name}: {mins[name]:.3f}")


if __name__ == "__main__":
    main()
