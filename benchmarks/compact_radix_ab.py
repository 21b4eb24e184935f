"""Interleaved in-context A/B of compact_mask's radix (descent width).

The rank-search descent gathers (capacity, radix) rows per level; radix
512 moves 2 x 512 lanes per slot across its two levels at 1080p sizes,
radix 256 moves 2 x 256 (at one extra pyramid level for the largest
octaves), radix 128 three levels x 128. Times the full dog->compact
prefix for all five octaves per radix, interleaved minima.

Usage: python benchmarks/compact_radix_ab.py [--rounds N]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp

from bench import device_time, make_test_image, log

from cudasift_tpu.config import SiftParams
from cudasift_tpu.ops import convolve
from cudasift_tpu.ops.detect import compact_mask
from cudasift_tpu.pipeline import _effective_params


def main():
    rounds = 5
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])

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

    def make(radix):
        def fn(p):
            outs = []
            for o in range(5):
                dog, mask = dog_and_mask_pallas(
                    bases[o] + p, kernels[o], params.thresh,
                    params.edge_limit, raw=True)
                idx, cnt = compact_mask(mask, caps[o], radix=radix)
                outs.append(dog.reshape(-1)[0] + idx.sum() + cnt)
            return outs
        return fn

    radii = [512, 256, 128]
    # Correctness first: identical indices across radii on the real masks.
    import numpy as np

    for o in range(5):
        _, mask = dog_and_mask_pallas(
            bases[o], kernels[o], params.thresh, params.edge_limit, raw=True)
        ref = None
        for r in radii:
            idx, cnt = compact_mask(mask, caps[o], radix=r)
            got = (np.asarray(idx), int(cnt))
            if ref is None:
                ref = got
            else:
                np.testing.assert_array_equal(got[0], ref[0])
                assert got[1] == ref[1]
    log("all radii agree bit-for-bit on the five real octave masks")

    mins = {r: 1e30 for r in radii}
    for rd in range(rounds):
        for r in radii:
            ms = device_time(make(r), chain=8, reps=7)
            mins[r] = min(mins[r], ms)
        log(f"round {rd}: " + "  ".join(
            f"r{r} {mins[r]:.3f}" for r in radii))
    log("---- minima (dog + compact, all five octaves, ms) ----")
    for r in radii:
        log(f"radix {r}: {mins[r]:.3f}")


if __name__ == "__main__":
    main()
