"""Standalone descriptor-matching benchmark — the analogue of match.cu.

The reference ships a self-contained study (match.cu:916-1081) that matches
two random 16384 x 128 descriptor sets with a ladder of CPU implementations
(naive -> AVX2 -> +OpenMP, match.cu:57-130) and GPU kernels (Match1..Match9,
with a measured GFLOPS table in the header comment, match.cu:39-55), plus an
exact-agreement check against the CPU result (CheckMatches, match.cu:132-141).

This script is the TPU edition:

  CPU ladder:  numpy naive loop  ->  numpy blocked matmul
  TPU ladder:  XLA scan matcher  ->  Pallas fused top-2 matcher (f32 / bf16)

and verifies exact best-index agreement between every implementation.

Usage: python benchmarks/match_bench.py [--n 16384] [--skip-naive]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def cpu_naive(d1, d2, limit=256):
    """Scalar triple loop (MatchC1, match.cu:57-71) — O(N^2 * 128) Python;
    run on a subset by default."""
    n = min(len(d1), limit)
    best = np.zeros(n)
    idx = np.zeros(n, np.int64)
    for i in range(n):
        bi, bv = -1, -1e30
        for j in range(len(d2)):
            s = float(d1[i] @ d2[j])
            if s > bv:
                bv, bi = s, j
        best[i], idx[i] = bv, bi
    return best, idx


def cpu_blocked(d1, d2, block=2048):
    """Blocked matmul matcher — the numpy analogue of MatchC3 (AVX2+OpenMP,
    match.cu:102-130); BLAS supplies the vectorization and threading."""
    n1 = len(d1)
    best = np.full(n1, -1e30, np.float32)
    idx = np.zeros(n1, np.int64)
    for j0 in range(0, len(d2), block):
        s = d1 @ d2[j0 : j0 + block].T
        jb = s.argmax(axis=1)
        vb = s[np.arange(n1), jb]
        upd = vb > best
        best[upd] = vb[upd]
        idx[upd] = j0 + jb[upd]
    return best, idx


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--skip-naive", action="store_true")
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    d1 = rng.standard_normal((args.n, 128)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = rng.standard_normal((args.n, 128)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    flops = 2.0 * args.n * args.n * 128

    print(f"matching {args.n} x {args.n} x 128-D descriptors")

    if not args.skip_naive:
        sub = 64
        t0 = time.perf_counter()
        nb, ni = cpu_naive(d1, d2, sub)
        t = time.perf_counter() - t0
        est = t * args.n / sub
        print(f"cpu naive      : {est*1e3:10.1f} ms (extrapolated from {sub} rows)")

    t0 = time.perf_counter()
    cb, ci = cpu_blocked(d1, d2)
    t_cpu = time.perf_counter() - t0
    print(f"cpu blocked    : {t_cpu*1e3:10.1f} ms ({flops/t_cpu/1e9:7.0f} GFLOPS)")
    if not args.skip_naive:
        assert (ci[:sub] == ni).all(), "CPU ladder disagrees"

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import device_time
    from cudasift_tpu.ops.match import match_descriptors
    from cudasift_tpu.ops.pallas.match import match_descriptors_pallas

    j1, j2 = jnp.asarray(d1), jnp.asarray(d2)
    nn = jnp.int32(args.n)
    on_tpu = jax.default_backend() not in ("cpu",)

    def report(name, fn, chain=8):
        ms = max(device_time(fn, chain=chain), 0.01)
        print(f"{name}: {ms:10.3f} ms ({flops/(ms*1e-3)/1e9:7.0f} GFLOPS)")

    report("xla scan       ", lambda p: match_descriptors(j1 + p, j2, nn, nn, tile=2048))
    if on_tpu:
        report("pallas f32     ", lambda p: match_descriptors_pallas(j1 + p, j2, nn, nn))
        report("pallas bf16    ", lambda p: match_descriptors_pallas(j1 + p, j2, nn, nn, use_bf16=True))

    # CheckMatches (match.cu:132-141): exact index agreement vs CPU.
    _, _, xi = match_descriptors(j1, j2, nn, nn, tile=2048)
    agree = float((np.asarray(xi) == ci).mean())
    print(f"xla vs cpu index agreement: {agree:.4f}")
    if on_tpu:
        _, _, pi = match_descriptors_pallas(j1, j2, nn, nn)
        print(f"pallas vs cpu index agreement: {float((np.asarray(pi) == ci).mean()):.4f}")
    assert agree > 0.999
    print("OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
