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
    d1_ref[...] = jnp.zeros((1, B, 128), jnp.float32)
    d2_ref[...] = jnp.zeros((1, B, 128), jnp.float32)
    meta_ref[...] = jnp.zeros((1, 8, B), jnp.float32)
"""
STUB_DESC = """
    d1_ref[...] = jnp.zeros((1, B, 128), jnp.float32)
    d2_ref[...] = jnp.zeros((1, B, 128), jnp.float32)
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
        tail_start = src.index("\ndef ", line_start)  # keep every later def
        # (_call_kernel, fused_tiles, _run_table, the jitted wrapper --
        # the old "\n@" cut assumed the wrapper came next and silently
        # dropped the helpers once the module grew)
        src = head + stub + src[tail_start:]
    mod = types.ModuleType(f"orient_desc_p{n_phases}")
    mod.__dict__["__name__"] = f"orient_desc_p{n_phases}"
    # Resolve the kernel's relative imports against the real package.
    mod.__dict__["__package__"] = "cudasift_tpu.ops.pallas"
    exec(compile(src, f"orient_desc_p{n_phases}.py", "exec"), mod.__dict__)
    return mod


def main_trace():
    """Chain all 6 truncated variants in ONE jitted program, capture a
    device trace, and read each variant's kernel duration directly from the
    chrome trace (events come out in schedule order, so the k-th
    od-kernel event is variant k). No differencing, no minima protocol —
    kernel durations on the trace are hardware-counter measurements."""
    import collections
    import glob
    import gzip
    import json
    import os

    from cudasift_tpu.utils.jit import tpu_compiler_options

    rng = np.random.default_rng(0)
    img = jnp.asarray(make_test_image(1080, 1920))
    n = 2048
    x = jnp.asarray(rng.uniform(30, 1890, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(30, 1050, n).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.95, 1.9, n).astype(np.float32))
    cnt = jnp.int32(n)

    mods = [make_variant(k) for k in range(6)]
    reps = 3

    def chain():
        acc = jnp.float32(0)
        for _ in range(reps):
            for mod in mods:
                out = mod.orient_and_describe_pallas(
                    img + acc * 1e-30, x, y, s, count=cnt, mode=MODE)
                for leaf in jax.tree.leaves(out):
                    acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
        return acc

    f = jax.jit(chain, compiler_options=tpu_compiler_options())
    float(f())
    logdir = "/tmp/xprof_ablation"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        float(f())
    tr_file = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(tr_file) as fh:
        tr = json.load(fh)
    evs = [e for e in tr["traceEvents"]
           if e.get("ph") == "X" and "orient_and_describe" in e.get("name", "")]
    evs.sort(key=lambda e: e["ts"])
    log(f"{len(evs)} kernel events ({reps} reps x 6 variants expected)")
    names = [
        "0 empty grid (overhead)",
        "1 + acquire",
        "2 + orient grids",
        "3 + histograms+peaks",
        "4 + desc sampling",
        "5 + binning (full)",
    ]
    per = collections.defaultdict(list)
    for i, e in enumerate(evs):
        per[i % 6].append(e["dur"])
    prev = 0.0
    for k in range(6):
        us = min(per[k]) if per[k] else float("nan")
        log(f"{names[k]:>26}: {us:8.1f} us ({us/n*1e3:6.0f} ns/kp) "
            f" marginal {(us-prev)/n*1e3:+6.0f} ns/kp   runs {['%.0f' % d for d in per[k]]}")
        prev = us


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
        t = device_time(lambda p: fn(img + p, x, y, s, count=cnt,
                                     mode=MODE), chain=8)
        log(f"phase<={np_} [{name:>22}]: {t:7.3f} ms  "
            f"({t/n*1e6:5.0f} ns/kp)  marginal {(t-prev)/n*1e6:+6.0f} ns/kp")
        prev = t


MODE = "exact"


if __name__ == "__main__":
    if "--mode" in sys.argv:
        MODE = sys.argv[sys.argv.index("--mode") + 1]
    if "--trace" in sys.argv:
        main_trace()
    else:
        main()
