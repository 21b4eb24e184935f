"""Cumulative-prefix ablation of the extraction pipeline.

extract_profile.py times stages in ISOLATION, which misses the XLA glue
between them (layout copies around pallas custom-calls, dup concats, the
merge scatter, constant zero-fills). This script times progressively longer
PREFIXES of the real TPU pipeline — each cut point consumes everything the
real program computes up to that stage — so consecutive deltas attribute
inter-stage glue to the phase that causes it. Numbers use the chained
differential timer (the only reliable device timer behind the axon tunnel).

Usage: python benchmarks/extract_ablation.py [HxW] [thresh]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import device_time, make_test_image, log

from cudasift_tpu.config import SiftParams
from cudasift_tpu.ops import convolve
from cudasift_tpu.ops.detect import compact_mask
from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas
from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas
from cudasift_tpu.pipeline import (_effective_params, _extract_octave,
                                   _extract_sift_traced)


STAGES = ("preproc", "dog", "compact", "refine", "orientdesc", "octave",
          "full")


def prefix(img, params: SiftParams, stop: str):
    """The real pipeline up to ``stop``; every live intermediate is returned
    (bench.device_time folds all leaves into the timing chain)."""
    low = convolve.low_pass(img, max(params.init_blur, 0.001))
    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))
    if stop == "preproc":
        return [b.sum() for b in bases]

    kernels = params.laplace_kernels
    outs = []
    for o in reversed(range(params.num_octaves)):
        base = bases[o]
        oh, ow = base.shape
        cap = params.candidate_capacity(oh, ow, o)
        if stop == "octave":
            fields, valid = _extract_octave(
                base, kernels[o], params, float(2 ** o), cap)
            outs.extend([fields["data"], fields["xpos"], valid])
            continue
        dog, mask = dog_and_mask_pallas(
            base, kernels[o], params.thresh, params.edge_limit, raw=True)
        if stop == "dog":
            outs.extend([dog, mask])
            continue
        flat_idx, count = compact_mask(mask, cap)
        if stop == "compact":
            outs.extend([dog[0, 0, 0], flat_idx, count])
            continue
        xp, yp, sc, sh, ed, valid = refine_candidates_pallas(
            dog, flat_idx, count, params.edge_limit, 0.0,
            logical_shape=base.shape)
        if stop == "refine":
            outs.extend([xp, yp, sc, sh, ed, valid, count])
            continue
        scale_safe = jnp.where(valid, sc, 1.0)
        d1, d2, pri, sec, has2 = orient_and_describe_pallas(
            base, xp, yp, scale_safe, count=count,
            fast=params.fast_gradients)
        outs.extend([d1, d2, pri, sec, has2, xp, yp, sc, sh, ed, valid])
    return outs


def main():
    shape = (1080, 1920)
    thresh = 3.0
    args = sys.argv[1:]
    if args and "x" in args[0]:
        h, w = args[0].split("x")
        shape = (int(h), int(w))
        args = args[1:]
    if args:
        thresh = float(args[0])
    h, w = shape
    params = _effective_params(
        SiftParams(num_octaves=5, init_blur=1.0, thresh=thresh,
                   max_pts=32768)
    )
    img = jnp.asarray(make_test_image(h, w))
    log(f"image {w}x{h} thresh {thresh}, device {jax.devices()[0]}")

    prev = 0.0
    for stage in STAGES:
        if stage == "full":
            fn = lambda p: _extract_sift_traced(img + p, params)
        else:
            fn = lambda p, s=stage: prefix(img + p, params, s)
        t = device_time(fn, chain=6, reps=9)
        log(f"{stage:>10}: {t:7.3f} ms   (+{t - prev:6.3f})")
        prev = t


if __name__ == "__main__":
    main()
