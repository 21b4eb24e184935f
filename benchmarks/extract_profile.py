"""Per-stage TPU timing breakdown of the extraction pipeline.

Times each stage of extract_sift at a given resolution with the chained
differential timer from bench.py (the only reliable device timer behind the
axon tunnel). Used to decide where optimization effort goes; not part of the
driver's headline bench.

Usage: python benchmarks/extract_profile.py [HxW]
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
from cudasift_tpu.ops.detect import (
    extrema_mask, compact_mask, refine_candidates, detect_octave,
)
from cudasift_tpu.ops.orient import histogram_peaks, compute_orientations
from cudasift_tpu.pipeline import _extract_sift_traced, _extract_octave, _compact


def main():
    shape = (1080, 1920)
    if len(sys.argv) > 1:
        h, w = sys.argv[1].split("x")
        shape = (int(h), int(w))
    h, w = shape
    params = SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0,
                        max_pts=32768)
    img = jnp.asarray(make_test_image(h, w))
    log(f"image {w}x{h}, device {jax.devices()[0]}")

    d = cs.extract_sift(img, params)
    log(f"numPts = {int(d.num_pts)}")

    total = device_time(lambda p: _extract_sift_traced(img + p, params),
                        chain=6, reps=9)
    log(f"TOTAL extract: {total:.3f} ms")

    # Preprocessing chain.
    low = convolve.low_pass(img, max(params.init_blur, 0.001))
    t = device_time(lambda p: convolve.low_pass(img + p, 1.0), chain=16)
    log(f"low_pass: {t:.3f} ms")

    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))
    t = device_time(lambda p: convolve.scale_down(bases[0] + p), chain=16)
    log(f"scale_down o0: {t:.3f} ms")

    kernels = params.laplace_kernels

    # Per-octave stage timings.
    for o in range(params.num_octaves):
        base = bases[o]
        oh, ow = base.shape
        cap = params.candidate_capacity(oh, ow)
        kern = kernels[o]

        def blur_dog(p, base=base, kern=kern):
            blur = convolve.blur_multi(base + p, kern)
            return blur[1:] - blur[:-1]

        dog = blur_dog(jnp.float32(0))
        t_dog = device_time(blur_dog, chain=16)

        def det(p, dog=dog, cap=cap):
            return detect_octave(dog + p, params.thresh, params.edge_limit,
                                 0.0, cap)

        cands = det(jnp.float32(0))
        t_det = device_time(det, chain=16)

        def msk(p, dog=dog):
            return extrema_mask(dog + p, params.thresh)

        t_mask = device_time(msk, chain=16)

        mask = msk(jnp.float32(0))

        def cmp_(p, mask=mask, cap=cap):
            return compact_mask(mask ^ (p > 1e30), cap)

        t_cmp = device_time(cmp_, chain=16)

        nlive = int(jnp.sum(cands.valid))
        log(f"octave {o} ({ow}x{oh}, cap {cap}, live {nlive}, "
            f"count {int(cands.count)}): blur+dog {t_dog:.3f}  "
            f"detect {t_det:.3f} (mask {t_mask:.3f} compact {t_cmp:.3f})")

        # Keypoint stages on this octave's real candidates.
        scale_safe = jnp.where(cands.valid, cands.scale, 1.0)
        from cudasift_tpu.ops.pallas.orient import orientation_histograms_pallas
        from cudasift_tpu.ops.pallas.descriptor import extract_descriptors_pallas

        def ori(p, base=base, c=cands, ss=scale_safe):
            return orientation_histograms_pallas(
                base + p, c.xpos, c.ypos, ss, count=c.count)

        t_ori = device_time(ori, chain=8)

        hist = ori(jnp.float32(0))
        def peaks(p, hist=hist):
            return histogram_peaks(hist + p)
        t_peaks = device_time(peaks, chain=16)

        def desc(p, base=base, c=cands, ss=scale_safe):
            return extract_descriptors_pallas(
                base + p, c.xpos, c.ypos, ss,
                jnp.zeros_like(c.xpos), count=c.count)

        t_desc = device_time(desc, chain=8)

        per_kp = (t_ori + t_desc) / max(nlive, 1) * 1e3
        log(f"octave {o}: orient {t_ori:.3f}  peaks {t_peaks:.3f}  "
            f"desc {t_desc:.3f}  ({per_kp:.2f} us/kp o+d)")

    # Final merge compaction at full size.
    slots = sum(
        (params.candidate_capacity(*bases[o].shape) * 5 // 4 + 127) // 128 * 128
        for o in range(params.num_octaves)
    )
    valid = jnp.arange(slots) % 3 == 0
    fields = {
        "xpos": jnp.ones((slots,), jnp.float32),
        "ypos": jnp.ones((slots,), jnp.float32),
        "scale": jnp.ones((slots,), jnp.float32),
        "sharpness": jnp.ones((slots,), jnp.float32),
        "edgeness": jnp.ones((slots,), jnp.float32),
        "orientation": jnp.ones((slots,), jnp.float32),
        "subsampling": jnp.ones((slots,), jnp.float32),
        "data": jnp.ones((slots, 128), jnp.float32),
    }
    cap_eff = min(params.max_pts, (slots + 127) // 128 * 128)

    def merge(p, fields=fields):
        f = dict(fields)
        f["xpos"] = f["xpos"] + p
        return _compact(f, valid, cap_eff)

    t = device_time(merge, chain=8)
    log(f"final merge compact ({slots} slots -> {cap_eff}): {t:.3f} ms")


if __name__ == "__main__":
    main()
