"""Per-op device profile of the full extraction via jax.profiler + xplane.

The interleaved-minima protocol gives whole-program numbers but cannot see
WHERE inside one program the time goes (isolated-stage chains measure a
different program). This captures a real trace of N chained extractions on
the device, parses the xplane proto, and prints per-op device durations
aggregated by HLO op category — the ground truth for the in-context stage
budget.

Usage: python benchmarks/xprof_extract.py [HxW] [--top K]
"""

from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import make_test_image, log

from cudasift_tpu.config import SiftParams
from cudasift_tpu.pipeline import _effective_params, _extract_sift_traced
from cudasift_tpu.utils.jit import tpu_compiler_options


def main():
    shape = (1080, 1920)
    top = 40
    args = sys.argv[1:]
    if "--top" in args:
        i = args.index("--top")
        top = int(args[i + 1])
        del args[i:i + 2]
    if args:
        h, w = args[0].split("x")
        shape = (int(h), int(w))
    h, w = shape

    params = _effective_params(
        SiftParams(num_octaves=5, init_blur=1.0, thresh=3.0, max_pts=32768)
    )
    img = jnp.asarray(make_test_image(h, w))
    log(f"image {w}x{h}, device {jax.devices()[0]}, "
        f"refine_layout {params.refine_layout}")

    reps = 3

    def chain():
        acc = jnp.float32(0)
        for _ in range(reps):
            out = _extract_sift_traced(img + acc * 1e-30, params)
            for leaf in jax.tree.leaves(out):
                acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
        return acc

    f = jax.jit(chain, compiler_options=tpu_compiler_options())
    float(f())  # compile + warm

    logdir = "/tmp/xprof_extract"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        float(f())

    planes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    log(f"xplane files: {planes}")
    if not planes:
        log("NO TRACE CAPTURED — profiler unsupported on this platform?")
        return

    try:
        from tensorflow.python.profiler.internal import _pywrap_profiler_plugin  # noqa
        # Parse the raw xplane proto directly.
        from tensorboard_plugin_profile.protobuf import xplane_pb2 as xpb
    except ImportError:
        # Some environments ship the profiler plugin without the raw
        # xplane protos; the chrome trace carries the same per-event
        # device durations (ts-sorted "X" events on the TPU rows).
        log("xplane_pb2 unavailable — falling back to chrome trace JSON")
        import gzip
        import json

        tr_file = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)[0]
        with gzip.open(tr_file) as fh:
            tr = json.load(fh)
        # Map pid -> process name to keep only device (TPU) rows.
        pid_name = {}
        for e in tr["traceEvents"]:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
        per_op = collections.Counter()
        per_pid = collections.Counter()
        for e in tr["traceEvents"]:
            if e.get("ph") != "X":
                continue
            pname = pid_name.get(e.get("pid"), "")
            if "TPU" not in pname and "tpu" not in pname.lower():
                continue
            per_op[e["name"]] += e.get("dur", 0)
            per_pid[pname] += e.get("dur", 0)
        log("---- per device-row totals (us, over %d reps) ----" % reps)
        for k, v in per_pid.most_common(10):
            log(f"{v/reps:10.1f}  {k}")
        # Aggregate by op family (strip .N instance suffixes / digits);
        # the jit_chain envelope event is the whole-program wall row.
        import re as _re
        fam = collections.Counter()
        fcnt = collections.Counter()
        for name, us in per_op.items():
            if name.startswith("jit_chain"):
                key = "jit_chain (program envelope)"
            else:
                key = _re.sub(r"[.\d]+$", "", name)
                key = _re.sub(r"\(\d+\)$", "", key)
            fam[key] += us
            fcnt[key] += 1
        log("---- per op-family totals (us per rep) ----")
        for k, v in fam.most_common(25):
            log(f"{v/reps:10.1f}  x{fcnt[k]:4d}  {k[:90]}")
        log(f"---- top {top} ops by device time (us per rep) ----")
        for name, us in per_op.most_common(top):
            log(f"{us/reps:10.1f}  {name[:110]}")
        log(f"TOTAL op-time per rep: {sum(per_op.values())/reps/1000:.3f} ms")
        return

    space = xpb.XSpace()
    with open(planes[0], "rb") as fh:
        space.ParseFromString(fh.read())

    per_op = collections.Counter()
    per_line = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            tot = 0
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur_us = ev.duration_ps / 1e6
                per_op[name] += dur_us
                tot += dur_us
            per_line[f"{plane.name} / {line.name}"] = (
                per_line.get(f"{plane.name} / {line.name}", 0) + tot)

    log("---- per line totals (us, over %d reps) ----" % reps)
    for k, v in sorted(per_line.items(), key=lambda kv: -kv[1])[:10]:
        log(f"{v/reps:10.1f}  {k}")

    log(f"---- top {top} ops by device time (us per rep) ----")
    for name, us in per_op.most_common(top):
        log(f"{us/reps:10.1f}  {name[:110]}")
    log(f"TOTAL op-time per rep: {sum(per_op.values())/reps/1000:.3f} ms")


if __name__ == "__main__":
    main()
