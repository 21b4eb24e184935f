"""End-to-end SIFT extraction — the TPU analogue of ``ExtractSift``.

The reference orchestrates extraction host-side: recursive octave descent
with pointer-arena arithmetic, constant-memory uploads and per-stage kernel
launches (cudaSiftH.cu:72-232). Here the entire pipeline is ONE jitted
program per (image shape, params): the octave recursion is unrolled at trace
time, Gaussian tap tables are baked in as constants, and inter-stage
"communication" is plain functional dataflow instead of device counters.

Octave processing order matches the reference (smallest octave first,
cudaSiftH.cu:146-167), so the final point layout groups octaves the same way:
within an octave, primary orientations precede second-peak duplicates.

One deliberate deviation: the reference's reported ``numPts`` excludes
second-orientation duplicates of the *last* (full-resolution) octave because
it reads counter[2*numOctaves] rather than the post-orientation counter
(cudaSiftH.cu:115 vs cudaSiftD.cu:1038-1043) even though it extracts their
descriptors; we include every extracted point.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .config import SiftParams
from .utils.jit import tpu_jit
from .ops import convolve
from .ops.detect import detect_octave
from .ops.orient import compute_orientations, histogram_peaks
from .ops.descriptor import extract_descriptors
from .sift_data import SiftData


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def _transient_error(e: Exception) -> bool:
    """Shared-chip tunnel hiccups, as opposed to Mosaic compile rejections."""
    msg = f"{type(e).__name__}: {e}"
    return any(s in msg for s in (
        "RESOURCE_EXHAUSTED", "DEADLINE_EXCEEDED", "UNAVAILABLE",
        "CANCELLED", "ABORTED", "timed out", "Connection",
    ))


@lru_cache(maxsize=1)
def _probe_refine_layout() -> str:
    """Pick the fastest refine DMA layout this backend's Mosaic accepts.

    Mosaic's rule for dynamic lane offsets in HBM DMA source slices is
    undocumented, varies by compiler version (the round-3 bench chip
    rejected offsets it could not prove divisible by the 128-lane tiling),
    and — with remote compilation — can change under a running installation.
    It is only checkable by compiling, so probe ONCE per process and let
    every entry point self-heal: "lane8" (8-aligned direct DMA) is tried
    first, then "pair" (128-aligned + conditional second fetch), then the
    always-compiling "copy" tier.

    The probe uses real octave-like shapes — dog (7, 64, 256), candidates
    with nonzero 8-aligned and 128-aligned lane offsets, a clamped sublane
    offset, and lane-tile-crossing windows (the weak (7,16,128) probe of
    round 3 could only ever produce offset 0 and certified nothing) — and
    accepts a tier only if its outputs match the copy tier BIT FOR BIT, so
    a layout that compiles but misaddresses can never be selected.
    Transient tunnel errors are retried once; only a persistent or
    compile-shaped failure demotes a tier."""
    import os
    import sys

    forced = os.environ.get("CUDASIFT_REFINE_LAYOUT", "")
    if forced:
        if forced not in ("lane8", "pair", "copy"):
            raise ValueError(
                f"CUDASIFT_REFINE_LAYOUT={forced!r}: want lane8|pair|copy")
        return forced

    from .ops.pallas.refine import refine_candidates_pallas

    h, w = 60, 250
    rng = np.random.default_rng(0)
    dog_l = rng.standard_normal((7, h, w)).astype(np.float32)
    dog_p = np.zeros((7, 64, 256), np.float32)
    dog_p[:, :h, :w] = dog_l
    dog_p = jnp.asarray(dog_p)
    # Coverage: x=33 -> ox=32 (8-aligned, NOT 128-aligned); x=130/200 ->
    # ox=128; x=127..129 -> windows crossing the first lane-tile edge
    # (rl > 125, the pair tier's conditional second fetch); x=248 ->
    # right-edge clamp; y=57..59 -> oy clamped to hp-16.
    xs = [5, 130, 127, 128, 129, 200, 248, 33]
    ys = [5, 58, 30, 59, 2, 50, 57, 9]
    ss = [1, 3, 5, 2, 4, 1, 3, 2]
    idx = np.array(
        [s * h * w + y * w + x for s, y, x in zip(ss, ys, xs)], np.int32)
    idx = jnp.asarray(np.pad(idx, (0, 64 - len(idx))))
    cnt = jnp.int32(len(xs))

    def run(**kw):
        out = refine_candidates_pallas(
            dog_p if kw else jnp.asarray(dog_l), idx, cnt, 10.0, 0.0, **kw)
        return [np.asarray(o) for o in out]

    ref = run()  # "copy" tier: the guaranteed-portable layout
    for tier, kw in (("lane8", dict(logical_shape=(h, w), lane8=True)),
                     ("pair", dict(logical_shape=(h, w), lane8=False))):
        for attempt in (0, 1):
            try:
                out = run(**kw)
            except Exception as e:  # noqa: BLE001 — classified below
                if _transient_error(e) and attempt == 0:
                    continue  # retry once; the tunnel drops runs sometimes
                print(f"cudasift_tpu: refine layout {tier!r} rejected by "
                      f"this backend ({type(e).__name__}); trying next tier",
                      file=sys.stderr)
                break
            if all(np.array_equal(a, b) for a, b in zip(out, ref)):
                return tier
            print(f"cudasift_tpu: refine layout {tier!r} compiled but "
                  "MISMATCHED the copy tier; trying next tier",
                  file=sys.stderr)
            break
    return "copy"


def _orientations(base, xpos, ypos, scale, use_pallas, count=None):
    if use_pallas and _on_tpu():
        from .ops.pallas.orient import orientation_histograms_pallas

        hist = orientation_histograms_pallas(base, xpos, ypos, scale, count=count)
        return histogram_peaks(hist)
    return compute_orientations(base, xpos, ypos, scale)


def _descriptors(base, xpos, ypos, scale, orientation, use_pallas, count=None):
    if use_pallas and _on_tpu():
        from .ops.pallas.descriptor import extract_descriptors_pallas

        return extract_descriptors_pallas(
            base, xpos, ypos, scale, orientation, count=count
        )
    return extract_descriptors(base, xpos, ypos, scale, orientation)


def _compact(fields: dict, valid: jnp.ndarray, capacity: int):
    """Stable-compact field arrays by a validity mask into fixed capacity.

    Deterministic replacement for the reference's atomicInc appends
    (cudaSiftD.cu:1420). Returns (fields, count).

    TPU scatters serialize per element, so exactly ONE scatter runs: the
    slot -> source index map. Everything else is row gathers — the scalar
    fields stacked into one (n, F) matrix so live rows move as 32-byte
    gather rows, the (n, 128) descriptors as 512-byte rows. (Measured: the
    per-field scatter form cost 0.95 ms of the 1080p extraction; this form
    ~0.15 ms.)
    """
    from .ops.scan import lane_stack, mask_cumsum

    n = valid.shape[0]
    pos = mask_cumsum(valid) - 1
    count = jnp.minimum(pos[-1] + 1, capacity).astype(jnp.int32)
    dest = jnp.where(valid, pos, capacity)
    src = jnp.zeros((capacity,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    live = jnp.arange(capacity) < count
    out = {}
    narrow = [k for k, v in fields.items() if v.ndim == 1]
    if narrow:
        stacked = lane_stack([fields[k] for k in narrow])    # (n, F)
        g = jnp.where(live[:, None], stacked[src], 0.0)      # (cap, F)
        for i, k in enumerate(narrow):
            out[k] = g[:, i].astype(fields[k].dtype)
    for k, v in fields.items():
        if v.ndim > 1:
            mask = live.reshape((capacity,) + (1,) * (v.ndim - 1))
            out[k] = jnp.where(mask, v[src], 0)
    return out, count


def _extract_octave(
    base: jnp.ndarray,
    kernels: np.ndarray,
    params: SiftParams,
    subsampling: float,
    capacity: int,
):
    """One octave: fused blur+DoG, detection, orientation, descriptors.

    Mirrors ExtractSiftOctave (cudaSiftH.cu:169-232). Returns a dict of
    per-point fields + validity, in image-global units (positions scaled by
    ``subsampling``, cudaSiftD.cu:410-414).

    On TPU the fused orient+descriptor kernel (the reference's
    OrientAndExtract, cudaSiftD.cu:1060-1150) produces both descriptors per
    candidate in one pass — no intermediate compaction, duplicates get full
    capacity. The XLA path (CPU/golden) keeps the two-stage
    orient -> compact -> describe structure.
    """
    from .ops.pallas.orient_desc import fused_tiles

    use_pallas = params.use_pallas and _on_tpu()
    # Whether the FUSED orient+descriptor kernel will consume the
    # candidates. It is mask-gated (takes scattered validity directly); the
    # split kernels are count-gated and need a front-packed table.
    fused_od = (
        use_pallas and params.use_fused
        and fused_tiles(*base.shape) is not None
    )
    if use_pallas:
        # Fused blur+DoG+extrema stencil (LaplaceMultiMem + the scan half of
        # FindPointsMultiNew in one pass): one image read per strip, mask and
        # edge prefilter computed in-register. Honest XLA cost of the same
        # ensemble is ~2.4 ms at 1080p vs ~1.4 ms for the stencil.
        from .ops.pallas.dog import dog_and_mask_pallas
        from .ops.detect import compact_mask, Candidates
        from .ops.pallas.refine import refine_candidates_pallas

        # raw=True (lane8/pair tiers): the DoG stack stays in the stencil's
        # padded layout (rows/lanes beyond the image hold clamp-padded
        # values) and the refine kernel DMAs from it directly — no
        # sliced/overlap-blocked HBM copy in between (~120 MB of pure copy
        # traffic at 1080p). See SiftParams.refine_layout for the tiers.
        raw = params.refine_layout != "copy"
        dog, mask = dog_and_mask_pallas(
            base, kernels, params.thresh, params.edge_limit, raw=raw
        )
        if params.use_pallas_compact:
            from .ops.pallas.compact import compact_mask_pallas

            flat_idx, count, total = compact_mask_pallas(
                mask, capacity, with_total=True)
        else:
            flat_idx, count, total = compact_mask(
                mask, capacity, with_total=True)
        oct_overflow = total - count
        xp, yp, sc, sh, ed, valid = refine_candidates_pallas(
            dog, flat_idx, count, params.edge_limit,
            params.lowest_scale_effective / subsampling,
            logical_shape=base.shape if raw else None,
            lane8=params.refine_layout != "pair",
        )
        if fused_od:
            # No stable-compact between refine and orient/descriptor: the
            # fused kernel's bucket compaction is mask-driven, so passing
            # refine's validity directly costs the same kernel blocks as a
            # front-packed table — the 5-field gather pass here measured
            # +0.49 ms in context (benchmarks/extract_prefix.py, round 5)
            # for zero downstream benefit. Raster order of live slots is
            # unchanged, so the final merged point set and order are
            # identical.
            cands = Candidates(
                xpos=xp, ypos=yp, scale=sc, sharpness=sh, edgeness=ed,
                valid=valid, count=valid.sum(dtype=jnp.int32),
            )
        else:
            # The split kernels are count-gated: front-pack the survivors.
            f0, live_count = _compact(
                {"xpos": xp, "ypos": yp, "scale": sc, "sharpness": sh,
                 "edgeness": ed},
                valid, capacity,
            )
            cands = Candidates(
                xpos=f0["xpos"], ypos=f0["ypos"], scale=f0["scale"],
                sharpness=f0["sharpness"], edgeness=f0["edgeness"],
                valid=jnp.arange(capacity) < live_count, count=live_count,
            )
    else:
        blur = convolve.blur_multi(base, kernels)
        dog = blur[1:] - blur[:-1]
        cands = detect_octave(
            dog,
            params.thresh,
            params.edge_limit,
            params.lowest_scale_effective / subsampling,
            capacity,
        )
        oct_overflow = cands.overflow

    scale_safe = jnp.where(cands.valid, cands.scale, 1.0)

    # Primary points first, then second-peak duplicates — matching the
    # reference's per-octave layout (detection range, then orientation
    # appends, cudaSiftD.cu:1039-1053).
    def dup(a, b=None):
        return jnp.concatenate([a, a if b is None else b])

    if fused_od:
        from .ops.pallas.orient_desc import orient_and_describe_pallas

        desc1, desc2, primary, secondary, has_second = (
            orient_and_describe_pallas(
                base, cands.xpos, cands.ypos, scale_safe, live=cands.valid,
                mode="fast" if params.fast_gradients else params.grad_mode,
            )
        )
        fields = {
            "xpos": dup(cands.xpos),
            "ypos": dup(cands.ypos),
            "scale": dup(cands.scale),
            "sharpness": dup(cands.sharpness),
            "edgeness": dup(cands.edgeness),
            "orientation": dup(primary, secondary),
            "data": jnp.concatenate([desc1, desc2]),
        }
        slot_valid = jnp.concatenate([cands.valid, cands.valid & has_second])
        # No masking of dead descriptor slots here: the final merge compact
        # gathers live rows only and zeroes everything past the count, so a
        # where() over the (2*cap, 128) array would only add HBM traffic.
    else:
        primary, secondary, has_second = _orientations(
            base, cands.xpos, cands.ypos, scale_safe, params.use_pallas,
            count=cands.count,
        )
        fields = {
            "xpos": dup(cands.xpos),
            "ypos": dup(cands.ypos),
            "scale": dup(cands.scale),
            "sharpness": dup(cands.sharpness),
            "edgeness": dup(cands.edgeness),
            "orientation": dup(primary, secondary),
        }
        valid = jnp.concatenate([cands.valid, cands.valid & has_second])

        # Full second-peak budget (every candidate may spawn one duplicate),
        # matching the fused TPU path — the CPU/XLA backend then produces the
        # same point set, and duplicates are only ever dropped at the global
        # maxPts clamp like the reference (cudaSiftD.cu:1420).
        desc_cap = capacity * 2
        fields, count = _compact(fields, valid, desc_cap)
        slot_valid = jnp.arange(desc_cap) < count

        desc = _descriptors(
            base,
            fields["xpos"],
            fields["ypos"],
            jnp.where(slot_valid, fields["scale"], 1.0),
            fields["orientation"],
            params.use_pallas,
            count=count,
        )
        # Dead slots keep kernel garbage; the final merge zeroes them.
        fields["data"] = desc

    fields["xpos"] = fields["xpos"] * subsampling
    fields["ypos"] = fields["ypos"] * subsampling
    fields["scale"] = fields["scale"] * subsampling
    fields["subsampling"] = jnp.where(slot_valid, subsampling, 0.0)
    return fields, slot_valid, oct_overflow


def _extract_sift_traced(image: jnp.ndarray, params: SiftParams) -> SiftData:
    # Safety net for direct callers (bench/profilers) that jit around the
    # public API: resolve refine_layout="auto" so a strict Mosaic can never
    # see the rejected tier (the round-3 bench crashed exactly this way).
    params = _effective_params(params)
    h, w = image.shape
    img = image.astype(jnp.float32)
    if params.scale_up:
        img = convolve.scale_up(img)
    low = convolve.low_pass(img, max(params.init_blur, 0.001))

    kernels = params.laplace_kernels
    bases = [low]
    for _ in range(params.num_octaves - 1):
        bases.append(convolve.scale_down(bases[-1]))

    all_fields: list[dict] = []
    all_valid: list[jnp.ndarray] = []
    overflow = jnp.zeros((), jnp.int32)
    # Smallest octave first (reference recursion order, cudaSiftH.cu:146-167).
    for o in reversed(range(params.num_octaves)):
        oh, ow = bases[o].shape
        cap = params.candidate_capacity(oh, ow, o)
        fields, valid, oct_overflow = _extract_octave(
            bases[o], kernels[o], params, float(2**o), cap
        )
        all_fields.append(fields)
        all_valid.append(valid)
        overflow = overflow + oct_overflow

    merged = {
        k: jnp.concatenate([f[k] for f in all_fields]) for k in all_fields[0]
    }
    valid = jnp.concatenate(all_valid)
    # Compact into the smaller of the API capacity and the actual slot total
    # (compaction cost scales with the destination size; padding to max_pts
    # afterwards is a free zero-fill).
    total_slots = valid.shape[0]
    cap_eff = min(params.max_pts, (total_slots + 127) // 128 * 128)
    merged, num_pts = _compact(merged, valid, cap_eff)
    # Global max_pts clamp (the reference's only visible saturation point,
    # cudaSiftD.cu:1420-1421) also counts toward the explicit overflow.
    overflow = overflow + valid.sum(dtype=jnp.int32) - num_pts
    if cap_eff < params.max_pts:
        pad = params.max_pts - cap_eff
        merged = {
            k: jnp.pad(v, [(0, pad)] + [(0, 0)] * (v.ndim - 1))
            for k, v in merged.items()
        }

    if params.scale_up:
        # RescalePositions(0.5) (cudaSiftH.cu:130, cudaSiftD.cu:753-761).
        for k in ("xpos", "ypos", "scale"):
            merged[k] = merged[k] * 0.5

    n = params.max_pts
    z = jnp.zeros((n,), jnp.float32)
    return SiftData(
        num_pts=num_pts,
        xpos=merged["xpos"],
        ypos=merged["ypos"],
        scale=merged["scale"],
        sharpness=merged["sharpness"],
        edgeness=merged["edgeness"],
        orientation=merged["orientation"],
        score=z,
        ambiguity=z,
        match=jnp.full((n,), -1, jnp.int32),
        match_xpos=z,
        match_ypos=z,
        match_error=z,
        subsampling=merged["subsampling"],
        data=merged["data"],
        overflow=overflow,
    )


@tpu_jit(static_argnames=("params",))
def _extract_sift_jit(image, params: SiftParams):
    return _extract_sift_traced(image, params)


@tpu_jit(static_argnames=("params",))
def _extract_batch_jit(images, params: SiftParams):
    # Unrolled, NOT vmapped: vmapping the Pallas keypoint kernels adds a
    # serializing batch grid dimension and re-runs every compaction at batch
    # width (measured ~1.6x worse per frame, ROADMAP.md). Unrolling keeps
    # each frame's stages count-gated at its own keypoint count and lets XLA
    # overlap independent frames' HBM traffic with compute.
    outs = [
        _extract_sift_traced(images[i], params)
        for i in range(images.shape[0])
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)


def _effective_params(params: SiftParams) -> SiftParams:
    """Resolve ``refine_layout="auto"`` to the concrete tier this backend
    supports (probed once per process, see _probe_refine_layout).

    Must run OUTSIDE any jax trace: the probe dispatches real kernels, and
    under tracing those would be staged into the caller's program. Every
    public entry point calls this before jitting; _extract_sift_traced also
    calls it as a safety net for direct private-API callers (bench harness,
    profilers), where the trace-clean guard below keeps an already-probed
    result usable and otherwise degrades to the portable tier."""
    if not (params.use_pallas and params.refine_layout == "auto"):
        return params
    if not _on_tpu():
        return params  # layout only affects the TPU Pallas path
    import dataclasses

    from .utils.jit import trace_state_clean

    if trace_state_clean():
        tier = _probe_refine_layout()
    elif _probe_refine_layout.cache_info().currsize:
        tier = _probe_refine_layout()  # pure cache hit; no kernel dispatch
    else:
        import sys

        tier = "copy"
        print(
            "cudasift_tpu: refine_layout='auto' reached inside a jax trace "
            "before the layout probe ran — using the portable 'copy' tier. "
            "Call pipeline._effective_params(params) (or extract_sift) once "
            "outside jit first to enable the direct-DMA tiers.",
            file=sys.stderr,
        )
    return dataclasses.replace(params, refine_layout=tier)


def extract_sift_throughput(
    images, params: SiftParams = SiftParams()
) -> SiftData:
    """Extract SIFT from N same-shaped frames in ONE device program.

    The TPU-native analogue of the reference demo's 1000-iteration
    extraction loop over a shared temp arena (mainSift.cpp:65-70): instead
    of amortizing allocations across host-driven calls, amortize the
    host->device dispatch and program overhead across frames by batching N
    frames into a single jitted program. Returns a SiftData whose fields
    carry a leading (N,) batch axis (``num_pts`` has shape (N,)).

    Per-frame device time matches single-frame extraction; the throughput
    win is the amortized per-call overhead, so larger batches help until
    compile time / HBM working set dominate. Compiled once per
    (batch, shape, params).

    Frames are UNROLLED at trace time (see _extract_batch_jit), so compile
    time scales linearly with the batch: batch 4-8 is the sweet spot
    (measured 3.2x single-frame rate at batch 4). For larger streams, chunk
    into batch-8 calls — one compile, amortized dispatch — instead of
    compiling a batch-64 program.
    """
    images = jnp.asarray(images, jnp.float32)
    if images.ndim != 3:
        raise ValueError(f"expected (N, H, W) frames, got {images.shape}")
    if images.shape[0] > 16:
        import warnings

        warnings.warn(
            f"extract_sift_throughput: batch {images.shape[0]} frames are "
            "unrolled at trace time — compile time scales linearly; chunk "
            "into batches of <= 8 and reuse the compiled program instead.",
            stacklevel=2,
        )
    return _extract_batch_jit(images, _effective_params(params))


def extract_sift(image, params: SiftParams = SiftParams()) -> SiftData:
    """Extract SIFT keypoints + descriptors from a single grayscale image.

    ``image``: (H, W) array-like, float32 grayscale (0..255 range typical).
    Compiled once per (shape, params); subsequent calls reuse the executable.
    """
    image = jnp.asarray(image, jnp.float32)
    if image.ndim != 2:
        raise ValueError(f"expected a 2-D grayscale image, got {image.shape}")
    return _extract_sift_jit(image, _effective_params(params))
