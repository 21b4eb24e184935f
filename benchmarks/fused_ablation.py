"""TPU timing of the fused orient+descriptor kernel vs the split kernels.

Times the v2 batched fused kernel against the split DMA kernels on N
synthetic keypoints, and checks TPU-vs-interpret agreement on a small set.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from bench import device_time, make_test_image, log
from cudasift_tpu.ops.pallas.orient_desc import orient_and_describe_pallas
from cudasift_tpu.ops.pallas.orient import orientation_histograms_pallas
from cudasift_tpu.ops.pallas.descriptor import extract_descriptors_pallas
from cudasift_tpu.ops.orient import histogram_peaks


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(make_test_image(1080, 1920))
    n = 2048
    x = jnp.asarray(rng.uniform(30, 1890, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(30, 1050, n).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.95, 1.9, n).astype(np.float32))
    cnt = jnp.int32(n)

    t = device_time(
        lambda p: orientation_histograms_pallas(img + p, x, y, s, count=cnt),
        chain=8)
    log(f"split orient:  {t:.3f} ms  ({t/n*1e6:.0f} ns/kp)")
    t = device_time(
        lambda p: extract_descriptors_pallas(
            img + p, x, y, s, jnp.full((n,), 45.0), count=cnt), chain=8)
    log(f"split desc:    {t:.3f} ms  ({t/n*1e6:.0f} ns/kp)")
    t = device_time(
        lambda p: orient_and_describe_pallas(img + p, x, y, s, count=cnt),
        chain=8)
    log(f"fused v2:      {t:.3f} ms  ({t/n*1e6:.0f} ns/kp)")

    # Cross-check: fused orientations vs split orientation peaks on TPU.
    d1, d2, o1, o2, h2 = orient_and_describe_pallas(img, x, y, s, count=cnt)
    hist = orientation_histograms_pallas(img, x, y, s, count=cnt)
    ro1, ro2, rh2 = histogram_peaks(hist)
    d = np.abs(np.asarray(o1) - np.asarray(ro1))
    d = np.minimum(d, 360.0 - d)
    log(f"orient agreement: median {np.median(d):.3f} deg, "
        f"<2deg {(d < 2.0).mean()*100:.1f}%, has2 agree "
        f"{(np.asarray(h2) == np.asarray(rh2)).mean()*100:.1f}%")
    rdesc = extract_descriptors_pallas(img, x, y, s, o1, count=cnt)
    err = np.abs(np.asarray(d1) - np.asarray(rdesc)).max(axis=1)
    log(f"desc vs split @fused-ori: median {np.median(err):.2e}, "
        f"max {err.max():.2e}")
    norms = np.linalg.norm(np.asarray(d1), axis=1)
    log(f"desc norms: [{norms.min():.4f}, {norms.max():.4f}]")


if __name__ == "__main__":
    main()
