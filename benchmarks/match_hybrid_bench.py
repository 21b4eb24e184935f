"""Hybrid-matcher stage decomposition on the real chip.

Interleaved-minima A/B (CLAUDE.md protocol) of the three matcher tiers plus
the hybrid's two stages in isolation, at the match.cu stress size
(16384 x 16384 x 128, match.cu:39-55). Answers: where do the hybrid's ms go
(sweep kernel vs top-k vs gather+rescore), and is it at / under the
single-pass HIGHEST tier.

Usage: python benchmarks/match_hybrid_bench.py [N] [--rounds R]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import device_time, log


def main():
    n = 16384
    rounds = 5
    args = sys.argv[1:]
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i:i + 2]
    if args:
        n = int(args[0])

    from cudasift_tpu.ops.pallas.match import (
        match_descriptors_pallas, _sweep_candidates, _exact_rescore,
    )

    rng = np.random.default_rng(0)
    d1 = rng.standard_normal((n, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = rng.standard_normal((n, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    j1, j2 = jnp.asarray(d1), jnp.asarray(d2)
    nn = jnp.int32(n)
    log(f"n={n}, device {jax.devices()[0]}")

    cs0, ci0 = jax.jit(
        lambda a, b: _sweep_candidates(a, b, nn, False))(j1, j2)
    cs0, ci0 = jax.block_until_ready((cs0, ci0))

    stages = {
        "highest": lambda p: match_descriptors_pallas(
            j1 + p, j2, nn, nn, rescore_k=None),
        "bf16": lambda p: match_descriptors_pallas(
            j1 + p, j2, nn, nn, use_bf16=True),
        "hybrid": lambda p: match_descriptors_pallas(
            j1 + p, j2, nn, nn, rescore_k=8),
        "sweep_only": lambda p: _sweep_candidates(j1 + p, j2, nn, False),
        "rescore_only": lambda p: _exact_rescore(
            cs0 + p, ci0, j1, j2, nn, 8),
    }

    # chain=24 at 16k compiles a ~30-billion-FLOP x24 program; the tunnel's
    # remote compiler wedged on it (round 5, 37 min no output). chain=8
    # still cancels dispatch overhead (per-call ~2.6 ms >> 40 ms/7 chain
    # steps) at a third of the program size.
    chain = 8 if n >= 8192 else 96
    mins = {k: 1e30 for k in stages}
    for r in range(rounds):
        for name, fn in stages.items():
            t = device_time(fn, chain=chain, reps=5)
            mins[name] = min(mins[name], t)
        log(f"round {r}: " + "  ".join(
            f"{k} {v:.3f}" for k, v in mins.items()))

    log("---- minima (ms) ----")
    for k, v in mins.items():
        log(f"{k:14s} {v:7.3f}")

    # Exactness spot-check vs f64 on this chip.
    bh, ah, ih = match_descriptors_pallas(j1, j2, nn, nn, rescore_k=None)
    bb, ab, ib = match_descriptors_pallas(j1, j2, nn, nn, rescore_k=8)
    sc = d1.astype(np.float64) @ d2.astype(np.float64).T
    gi = sc.argmax(1)
    log(f"exact-vs-f64 idx agreement (random): highest "
        f"{(np.asarray(ih) == gi).mean():.6f}, hybrid "
        f"{(np.asarray(ib) == gi).mean():.6f}")

    # Same check on the bundled stereo pair's REAL descriptors — repetitive
    # facades carry signal in the last f32 bits, the case that reverted the
    # pure-bf16 tier in round 3 (ROADMAP.md). Ties (several columns sharing
    # a row's f64 max, common on repeated structure) accept any argmax.
    try:
        import cv2
    except ImportError:
        cv2 = None
    if cv2 is not None:
        from cudasift_tpu.config import SiftParams
        from cudasift_tpu.pipeline import extract_sift

        left = cv2.imread("/root/reference/data/left.pgm", 0)
        righ = cv2.imread("/root/reference/data/righ.pgm", 0)
        pr = SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0,
                        max_pts=32768)
        e1 = extract_sift(jnp.asarray(left.astype(np.float32)), pr)
        e2 = extract_sift(jnp.asarray(righ.astype(np.float32)), pr)
        n1, n2 = int(e1.num_pts), int(e2.num_pts)
        q1 = np.asarray(e1.data)[:n1]
        q2 = np.asarray(e2.data)[:n2]
        bq, aq, iq = match_descriptors_pallas(
            jnp.asarray(e1.data), jnp.asarray(e2.data),
            jnp.int32(n1), jnp.int32(n2), rescore_k=8)
        scq = q1.astype(np.float64) @ q2.astype(np.float64).T
        giq = scq.argmax(1)
        idx = np.asarray(iq)[:n1]
        mism = idx != giq
        # A mismatch is only real if the f64 scores actually differ.
        real = mism & ~np.isclose(
            scq[np.arange(n1), idx], scq[np.arange(n1), giq],
            rtol=0, atol=0)
        log(f"bundled-pair ({n1}x{n2}) hybrid-vs-f64: "
            f"{(~mism).mean():.6f} agree, {int(mism.sum())} raw mismatches, "
            f"{int(real.sum())} with genuinely different f64 scores")


if __name__ == "__main__":
    main()
