"""Per-stage TPU timing of the REAL (Pallas) extraction path.

Unlike extract_profile.py (which times the XLA/golden stages), this times
the stages extract_sift actually runs on TPU: the fused blur+DoG+mask
stencil, mask compaction, count-gated refine, and the fused
orient+descriptor kernel, per octave, plus preprocessing and final merge.

Usage: python benchmarks/detect_profile.py [HxW]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import device_time, make_test_image, log

import cudasift_tpu as cs
from cudasift_tpu.config import SiftParams
from cudasift_tpu.ops import convolve
from cudasift_tpu.ops.detect import compact_mask
from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas
from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas
from cudasift_tpu.pipeline import _effective_params, _extract_sift_traced


def main():
    shape = (1080, 1920)
    if len(sys.argv) > 1:
        h, w = sys.argv[1].split("x")
        shape = (int(h), int(w))
    h, w = shape
    params = _effective_params(
        SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0, max_pts=32768)
    )
    img = jnp.asarray(make_test_image(h, w))
    log(f"image {w}x{h}, device {jax.devices()[0]}")

    d = cs.extract_sift(img, params)
    log(f"numPts = {int(d.num_pts)}")
    total = device_time(lambda p: _extract_sift_traced(img + p, params),
                        chain=6, reps=7)
    log(f"TOTAL extract: {total:.3f} ms")

    low = convolve.low_pass(img, max(params.init_blur, 0.001))
    t = device_time(lambda p: convolve.low_pass(img + p, 1.0), chain=16)
    log(f"low_pass: {t:.3f} ms")
    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))
    t = device_time(lambda p: convolve.scale_down(bases[0] + p), chain=16)
    log(f"scale_down o0: {t:.3f} ms")

    kernels = params.laplace_kernels
    sum_stages = 0.0
    for o in range(params.num_octaves):
        base = bases[o]
        oh, ow = base.shape
        cap = params.candidate_capacity(oh, ow, o)
        kern = kernels[o]
        lo_sc = params.lowest_scale_effective / float(2**o)

        def dm(p, base=base, kern=kern):
            return dog_and_mask_pallas(base + p, kern, params.thresh,
                                       params.edge_limit)

        dog, mask = dm(jnp.float32(0))
        t_dm = device_time(dm, chain=12)

        def cmp_(p, mask=mask, cap=cap):
            return compact_mask(mask ^ (p > 1e30), cap)

        flat_idx, count = cmp_(jnp.float32(0))
        t_cmp = device_time(cmp_, chain=12)

        def ref(p, dog=dog, flat_idx=flat_idx, count=count, lo_sc=lo_sc):
            return refine_candidates_pallas(dog + p, flat_idx, count,
                                            params.edge_limit, lo_sc)

        xp, yp, sc, sh, ed, valid = ref(jnp.float32(0))
        t_ref = device_time(ref, chain=12)

        nlive = int(jnp.sum(valid))
        sc_safe = jnp.where(valid, sc, 1.0)

        def od(p, base=base, xp=xp, yp=yp, sc_safe=sc_safe, count=count):
            return orient_and_describe_pallas(
                base + p, xp, yp, sc_safe, count=count)

        t_od = device_time(od, chain=8)
        per_kp = t_od / max(nlive, 1) * 1e6
        sum_stages += t_dm + t_cmp + t_ref + t_od
        log(f"octave {o} ({ow}x{oh}, cap {cap}, live {nlive}): "
            f"dog+mask {t_dm:.3f}  compact {t_cmp:.3f}  refine {t_ref:.3f}  "
            f"orient+desc {t_od:.3f} ({per_kp:.0f} ns/kp)")

    log(f"sum of octave stages: {sum_stages:.3f} ms "
        f"(merge/preproc/overhead = {total - sum_stages:.3f})")


if __name__ == "__main__":
    main()
