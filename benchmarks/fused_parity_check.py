"""TPU e2e check: fused-v2 pipeline vs split-kernel pipeline on data/left.pgm.

Compares keypoint sets and descriptor agreement between use_fused=True and
use_fused=False (both Pallas on TPU). Keypoint sets should be identical
(detection is shared); orientations/descriptors should agree within the
bf16 envelope on nearly all points.
"""

from __future__ import annotations

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

import cudasift_tpu as cs
from cudasift_tpu.config import SiftParams
from cudasift_tpu.utils.io import read_pgm
from bench import log


def main():
    img = jnp.asarray(read_pgm("/root/reference/data/left.pgm"))
    base = SiftParams(num_octaves=5, init_blur=1.0, thresh=4.5, max_pts=32768)
    pf = dataclasses.replace(base, use_fused=True)
    ps = dataclasses.replace(base, use_fused=False)

    df = cs.extract_sift(img, pf)
    ds = cs.extract_sift(img, ps)
    nf, ns = int(df.num_pts), int(ds.num_pts)
    log(f"numPts fused={nf} split={ns}")

    def keyset(d, n):
        return {
            (round(float(x), 2), round(float(y), 2), round(float(s), 2))
            for x, y, s in zip(
                np.asarray(d.xpos)[:n], np.asarray(d.ypos)[:n],
                np.asarray(d.scale)[:n])
        }

    kf, ks = keyset(df, nf), keyset(ds, ns)
    inter = len(kf & ks)
    log(f"keypoint set overlap: {inter}/{max(len(kf), len(ks))} "
        f"({inter/max(len(kf), len(ks))*100:.2f}%)")

    # Descriptor/orientation agreement on position-matched points.
    def table(d, n):
        out = {}
        for i in range(n):
            key = (round(float(np.asarray(d.xpos)[i]), 2),
                   round(float(np.asarray(d.ypos)[i]), 2),
                   round(float(np.asarray(d.scale)[i]), 2))
            out.setdefault(key, []).append(i)
        return out

    tf, ts = table(df, nf), table(ds, ns)
    dataf = np.asarray(df.data)
    datas = np.asarray(ds.data)
    orif = np.asarray(df.orientation)
    oris = np.asarray(ds.orientation)
    derr, oerr = [], []
    for key, fidx in tf.items():
        sidx = ts.get(key)
        if sidx is None or len(fidx) != len(sidx):
            continue
        for a, b in zip(fidx, sidx):
            do = abs(orif[a] - oris[b])
            oerr.append(min(do, 360.0 - do))
            derr.append(np.abs(dataf[a] - datas[b]).max())
    derr = np.asarray(derr)
    oerr = np.asarray(oerr)
    log(f"matched {len(derr)} pts: ori median {np.median(oerr):.3f} deg "
        f"(<2deg {(oerr < 2).mean()*100:.1f}%), desc err median "
        f"{np.median(derr):.2e} p99 {np.percentile(derr, 99):.2e}")


if __name__ == "__main__":
    main()
