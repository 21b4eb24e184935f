"""In-kernel phase breakdown of the fused orient+descriptor kernel.

Builds truncated variants of ops/pallas/orient_desc.py by cutting
``_block_body`` at each "# ---- Phase N" marker (stubbing the output
writes), compiles each on the TPU, and reports the marginal cost of every
phase. Ref stores to scratch are side effects in Pallas, so truncated
variants still execute all retained phases.

Usage: python benchmarks/fused_phase_ablation.py
"""

from __future__ import annotations

import re
import sys
import types

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import device_time, make_test_image, log

SRC_PATH = "/root/repo/cudasift_tpu/ops/pallas/orient_desc.py"
MARKERS = [
    "# ---- Phase 1",
    "# ---- Phase 2",
    "# ---- Phase 3",
    "# ---- Phase 4",
    "# ---- Phase 5",
]
STUB = """
    d1_ref[...] = jnp.zeros((1, 128, B), jnp.float32)
    d2_ref[...] = jnp.zeros((1, 128, B), jnp.float32)
    meta_ref[...] = jnp.zeros((1, 8, B), jnp.float32)
"""
STUB_DESC = """
    d1_ref[...] = jnp.zeros((1, 128, B), jnp.float32)
    d2_ref[...] = jnp.zeros((1, 128, B), jnp.float32)
"""


def make_variant(n_phases: int) -> types.ModuleType:
    src = open(SRC_PATH).read()
    if n_phases < 5:
        cut = src.index(MARKERS[n_phases])
        # Find the enclosing line start, keep everything before it, stub the
        # outputs that later phases would have written.
        line_start = src.rfind("\n", 0, cut) + 1
        head = src[:line_start]
        # meta_ref is written in phase 3; d1/d2 in phase 5.
        stub = STUB if n_phases < 3 else STUB_DESC
        tail_start = src.index("\n@", line_start)  # the jitted wrapper
        src = head + stub + src[tail_start:]
    mod = types.ModuleType(f"orient_desc_p{n_phases}")
    mod.__dict__["__name__"] = f"orient_desc_p{n_phases}"
    # Resolve the kernel's relative imports against the real package.
    mod.__dict__["__package__"] = "cudasift_tpu.ops.pallas"
    exec(compile(src, f"orient_desc_p{n_phases}.py", "exec"), mod.__dict__)
    return mod


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(make_test_image(1080, 1920))
    n = 2048
    x = jnp.asarray(rng.uniform(30, 1890, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(30, 1050, n).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.95, 1.9, n).astype(np.float32))
    cnt = jnp.int32(n)

    prev = 0.0
    names = [
        "empty grid (overhead)",
        "1 acquire",
        "2 orient grids",
        "3 histograms+peaks",
        "4 desc sampling",
        "5 binning (full)",
    ]
    for np_, name in zip(range(6), names):
        mod = make_variant(np_)
        fn = mod.orient_and_describe_pallas
        t = device_time(lambda p: fn(img + p, x, y, s, count=cnt), chain=8)
        log(f"phase<={np_} [{name:>22}]: {t:7.3f} ms  "
            f"({t/n*1e6:5.0f} ns/kp)  marginal {(t-prev)/n*1e6:+6.0f} ns/kp")
        prev = t


if __name__ == "__main__":
    main()
