"""Interleaved A/B of FULL extraction between two git trees, one process.

The shared chip's tenant noise (±30%, bursty over hours) makes absolute
single-run numbers incomparable across runs; interleaving two trees'
programs in one process and comparing minima cancels it. The old tree is
exported with `git archive <sha> cudasift_tpu | tar -x` and imported under
a renamed package root (all internal imports are relative).

Usage:
    git archive <sha> cudasift_tpu | tar -x -C /tmp/r4tree/
    mv /tmp/r4tree/cudasift_tpu /tmp/r4tree/cudasift_tpu_r4
    python benchmarks/tree_ab.py [HxW] [--rounds N]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/tmp/r4tree")

import jax
import jax.numpy as jnp

from bench import device_time, make_test_image, log


def main():
    shape = (1080, 1920)
    rounds = 6
    args = sys.argv[1:]
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i : i + 2]
    if args:
        h, w = args[0].split("x")
        shape = (int(h), int(w))
    h, w = shape

    import cudasift_tpu_r4.config as cfg_old
    import cudasift_tpu_r4.pipeline as pl_old
    import cudasift_tpu_r4.ops.scan as scan_old
    import cudasift_tpu.config as cfg_new
    import cudasift_tpu.pipeline as pl_new

    # The r4 snapshot carries the lru_cache tracer leak (fixed in r5):
    # populate its cache EAGERLY so the first call is never inside a trace.
    scan_old._tri_bf16()

    img = jnp.asarray(make_test_image(h, w))
    p_old = pl_old._effective_params(
        cfg_old.SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0,
                           max_pts=32768))
    p_new = pl_new._effective_params(
        cfg_new.SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0,
                           max_pts=32768))
    log(f"{w}x{h}, device {jax.devices()[0]}, layouts "
        f"old={p_old.refine_layout} new={p_new.refine_layout}")

    n_old = int(pl_old.extract_sift(img, p_old).num_pts)
    n_new = int(pl_new.extract_sift(img, p_new).num_pts)
    log(f"numPts old {n_old} new {n_new}")

    trees = {
        "r4": lambda p: pl_old._extract_sift_traced(img + p, p_old),
        "r5": lambda p: pl_new._extract_sift_traced(img + p, p_new),
    }
    mins = {k: 1e30 for k in trees}
    for r in range(rounds):
        for k, fn in trees.items():
            ms = device_time(fn, chain=6, reps=7)
            mins[k] = min(mins[k], ms)
        log(f"round {r}: " + "  ".join(f"{k} {mins[k]:.3f}" for k in trees))
    log("---- minima ----")
    for k, v in mins.items():
        log(f"{k}: {v:.3f} ms")
    log(f"speedup r4/r5: {mins['r4'] / mins['r5']:.3f}x")


if __name__ == "__main__":
    main()
