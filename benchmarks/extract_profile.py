"""Per-stage TPU timing breakdown of the extraction pipeline.

Times each stage of the REAL TPU path of extract_sift (the Pallas DoG
stencil, rank-search compaction, Pallas refine, fused orient+descriptor
kernel, final merge) with the chained differential timer from bench.py (the
only reliable device timer behind the axon tunnel). Used to decide where
optimization effort goes; not part of the driver's headline bench.

Usage: python benchmarks/extract_profile.py [HxW] [--total]
  --total also times the full extract_sift program (two extra multi-minute
  compiles at 1080p — skip it unless you need the glue remainder).
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
from cudasift_tpu.pipeline import _compact, _effective_params, _extract_sift_traced


def main():
    shape = (1080, 1920)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    want_total = "--total" in sys.argv
    if args:
        h, w = args[0].split("x")
        shape = (int(h), int(w))
    h, w = shape
    params = _effective_params(
        SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0, max_pts=32768)
    )
    img = jnp.asarray(make_test_image(h, w))
    log(f"image {w}x{h}, device {jax.devices()[0]}")

    d = cs.extract_sift(img, params)
    log(f"numPts = {int(d.num_pts)}")

    stage_sum = 0.0
    if want_total:
        total = device_time(lambda p: _extract_sift_traced(img + p, params),
                            chain=6, reps=9)
        log(f"TOTAL extract: {total:.3f} ms")

    # Preprocessing chain.
    low = convolve.low_pass(img, max(params.init_blur, 0.001))
    t = device_time(lambda p: convolve.low_pass(img + p, 1.0), chain=16)
    log(f"low_pass: {t:.3f} ms")
    stage_sum += t

    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))

    def sd_chain(p):
        b = bases[0] + p
        outs = []
        for _ in range(params.num_octaves - 1):
            b = convolve.scale_down(b)
            # Demand every element (a [0,0] probe lets XLA slice-fuse the
            # whole chain down to a sliver and report ~0 ms).
            outs.append(b.sum())
        return jnp.stack(outs)

    t = device_time(sd_chain, chain=16)
    log(f"scale_down chain (x{params.num_octaves - 1}): {t:.3f} ms")
    stage_sum += t

    kernels = params.laplace_kernels

    from cudasift_tpu.ops.pallas.dog import dog_and_mask_pallas
    from cudasift_tpu.ops.pallas.refine import refine_candidates_pallas
    from cudasift_tpu.ops.pallas.orient_desc import (
        orient_and_describe_pallas, fused_tiles,
    )

    # Per-octave stage timings along the REAL TPU path.
    for o in range(params.num_octaves):
        base = bases[o]
        oh, ow = base.shape
        cap = params.candidate_capacity(oh, ow, o)
        kern = kernels[o]

        def dogmask(p, base=base, kern=kern):
            return dog_and_mask_pallas(base + p, kern, params.thresh,
                                       params.edge_limit, raw=True)

        dog, mask = dogmask(jnp.float32(0))
        t_dog = device_time(dogmask, chain=16)

        def cmp_(p, mask=mask, cap=cap):
            return compact_mask(mask ^ (p > 1e30), cap)

        idx, cnt = cmp_(jnp.float32(0))
        t_cmp = device_time(cmp_, chain=16)

        def ref_(p, dog=dog, idx=idx, cnt=cnt, shape=base.shape):
            return refine_candidates_pallas(dog + p, idx, cnt,
                                            params.edge_limit, 0.0,
                                            logical_shape=shape,
                                            lane8=params.refine_layout != "pair")

        xp, yp, sc, sh, ed, valid = ref_(jnp.float32(0))
        t_ref = device_time(ref_, chain=16)
        nlive = int(jnp.sum(valid))

        scale_safe = jnp.where(valid, sc, 1.0)

        def od(p, base=base, xp=xp, yp=yp, ss=scale_safe, cnt=cnt):
            return orient_and_describe_pallas(base + p, xp, yp, ss, count=cnt)

        t_od = device_time(od, chain=8)
        per_kp = t_od / max(nlive, 1) * 1e3
        log(f"octave {o} ({ow}x{oh}, cap {cap}, cnt {int(cnt)}, live {nlive}): "
            f"dog+mask {t_dog:.3f}  compact {t_cmp:.3f}  refine {t_ref:.3f}  "
            f"orient+desc {t_od:.3f} ({per_kp:.2f} us/kp, "
            f"tiles {fused_tiles(oh, ow)})")
        stage_sum += t_dog + t_cmp + t_ref + t_od

    # Final merge compaction at full size.
    slots = sum(
        2 * params.candidate_capacity(*bases[o].shape, o)
        for o in range(params.num_octaves)
    )
    valid = jnp.arange(slots) % 3 == 0
    fields = {
        k: jnp.ones((slots,), jnp.float32)
        for k in ("xpos", "ypos", "scale", "sharpness", "edgeness",
                  "orientation", "subsampling")
    }
    fields["data"] = jnp.ones((slots, 128), jnp.float32)
    cap_eff = min(params.max_pts, (slots + 127) // 128 * 128)

    def merge(p, fields=fields):
        f = dict(fields)
        f["xpos"] = f["xpos"] + p
        return _compact(f, valid, cap_eff)

    t = device_time(merge, chain=8)
    log(f"final merge compact ({slots} slots -> {cap_eff}): {t:.3f} ms")
    stage_sum += t
    log(f"stage sum (excl. inter-stage glue): {stage_sum:.3f} ms")


if __name__ == "__main__":
    main()
