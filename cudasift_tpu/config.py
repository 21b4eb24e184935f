"""Static configuration for the TPU-native SIFT pipeline.

The reference (Celebrandil/CudaSift) spreads its configuration over three tiers:
compile-time tile constants (cudaSiftD.h:8-42), hard-coded algorithm constants
(edge limit cudaSiftH.cu:213, descriptor clamp cudaSiftD.cu:398, second-peak
ratio cudaSiftD.cu:1039) and runtime API parameters (cudaSift.h:38,42-43).
Here everything lives in one frozen dataclass that is hashable, so it can be
passed as a static argument to ``jax.jit`` — octave shapes and Gaussian kernel
tables are then resolved at trace time, giving XLA fully static shapes.
"""

from __future__ import annotations

import dataclasses
import math
from functools import cached_property

import numpy as np

# Number of DoG scales searched for extrema per octave (cudaSiftD.h:8).
NUM_SCALES = 5
# Number of Gaussian scales per octave = NUM_SCALES + 3 (cudaSiftD.h:35).
NUM_LAPLACE_SCALES = NUM_SCALES + 3
# Gaussian blur kernel radius (cudaSiftD.h:38).
LAPLACE_R = 4
# LowPass prefilter radius (cudaSiftD.h:42).
LOWPASS_R = 4
# Edge-response limit: reject if trace^2 >= limit * det (cudaSiftH.cu:213).
EDGE_LIMIT = 10.0
# Descriptor value clamp between the two L2 normalizations (cudaSiftD.cu:398).
DESC_CLAMP = 0.2
# Second orientation peak must exceed this fraction of the best peak to spawn
# a duplicate keypoint (cudaSiftD.cu:1039).
SECOND_PEAK_RATIO = 0.8
# Orientation histogram bins (cudaSiftD.cu:974 hist[64]: 32 raw + 32 smoothed).
NUM_ORI_BINS = 32
# Descriptor geometry: 4x4 spatial cells x 8 orientation bins from a 16x16
# sample grid (cudaSiftD.cu:337-386).
DESC_WIDTH = 16
DESC_DIM = 128


def gaussian_kernel_1d(radius: int, variance: float) -> np.ndarray:
    """Normalized symmetric 1-D Gaussian taps, length ``2*radius+1``.

    Mirrors the host-side construction for the ScaleDown 5-tap kernel
    (cudaSiftH.cu:315-325) and the LowPass 9-tap kernel (cudaSiftH.cu:406-421):
    ``k[j] = exp(-j^2 / (2*variance))``, normalized to sum 1.
    """
    j = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(j * j) / (2.0 * variance))
    return (k / k.sum()).astype(np.float32)


def laplace_kernels(num_octaves: int, init_blur: float = 0.0) -> np.ndarray:
    """Per-octave, per-scale 1-D Gaussian taps for the scale-space pyramid.

    Mirrors ``PrepareLaplaceKernels`` (cudaSiftH.cu:439-458): octave ``o``
    (0 = full resolution, num_octaves-1 = smallest) uses residual base blur
    accumulated through the ScaleDown chain,
    ``b_{o+1} = sqrt(b_o^2 + 0.5^2) / 2`` with ``b_0 = init_blur``,
    and scale ``s`` targets sigma ``2^((s-1)/NUM_SCALES)``, i.e. variance
    ``sigma_s^2 - b_o^2``. Returns shape ``(num_octaves, 8, 9)`` float32,
    normalized symmetric taps (center at index LAPLACE_R).
    """
    out = np.zeros((num_octaves, NUM_LAPLACE_SCALES, 2 * LAPLACE_R + 1), np.float64)
    blur = float(init_blur)
    for o in range(num_octaves):
        scale = 2.0 ** (-1.0 / NUM_SCALES)
        diff_scale = 2.0 ** (1.0 / NUM_SCALES)
        for s in range(NUM_LAPLACE_SCALES):
            var = scale * scale - blur * blur
            j = np.arange(0, LAPLACE_R + 1, dtype=np.float64)
            half = np.exp(-(j * j) / (2.0 * var))
            norm = half[0] + 2.0 * half[1:].sum()
            half /= norm
            out[o, s, LAPLACE_R:] = half
            out[o, s, :LAPLACE_R] = half[1:][::-1]
            scale *= diff_scale
        blur = math.sqrt(blur * blur + 0.25) / 2.0
    return out.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class SiftParams:
    """All static knobs of the extraction pipeline (hashable; jit-static).

    Mirrors the runtime parameters of ``ExtractSift`` (cudaSift.h:38) plus the
    internal constants the reference hard-codes.
    """

    num_octaves: int = 5
    init_blur: float = 1.0
    thresh: float = 3.0
    lowest_scale: float = 0.0
    scale_up: bool = False
    max_pts: int = 32768
    # Fraction of octave DoG voxels reserved as extrema-candidate slots
    # before compaction. The reference appends via atomicInc with a global
    # cap; we use fixed per-octave capacities so shapes stay static under
    # jit. Real images at thresh>=1 yield well under 1 candidate per 2048
    # voxels (README.md:111-121: 4236 features TOTAL at 1280x960, thresh 1.0);
    # overflow saturates and is reported via num_pts.
    candidate_fraction: float = 1.0 / 2048.0
    min_candidates: int = 256
    edge_limit: float = EDGE_LIMIT
    compute_dtype: str = "float32"
    # Use the Pallas TPU kernels for orientation/descriptors (ignored on CPU,
    # where the XLA twins run instead).
    use_pallas: bool = True
    # Use the fused orient+descriptor kernel (OrientAndExtract analogue,
    # cudaSiftD.cu:1060): batched v2 with a VMEM-resident octave image,
    # 803 ns/keypoint vs 2142 for the split kernels. Octave bases too large
    # for VMEM (see ops.pallas.orient_desc.fits_vmem) fall back to the
    # split DMA kernels automatically.
    use_fused: bool = True
    # Opt-in approximate descriptor sampling (TPU fused path only): sample
    # central-difference gradient fields at the 256 rotated grid points and
    # rotate, instead of 4 bilinear taps per sample. ~2x cheaper descriptor
    # stage; descriptors deviate from the reference's
    # interpolate-then-difference by O(h^2) curvature terms (cosine >= 0.93,
    # median 0.998 vs exact). The ratio test is hypersensitive to this on
    # repetitive scenes — the bundled-pair match rate drops 36.9% -> 19.9%
    # (tests/test_envelope.py guards the level) — so it suits throughput-
    # over-precision workloads only and is OFF by default.
    fast_gradients: bool = False
    # Descriptor gradient sampler of the fused TPU kernel (phase 4):
    #   "exact" — 4 bilinear taps per sample (reference arithmetic,
    #             cudaSiftD.cu:337-343);
    #   "shift" — rotation-aligned gradient fields from fractional
    #             +-(cos a, sin a) bilinear patch shifts, sampled by one
    #             shared 256-lane tent. Same tap axes as exact; the only
    #             deviation is double-bilinear smoothing (the two hat
    #             kernels convolve into a 2 px support);
    #   "fast"  — alias target of fast_gradients (see above).
    # Default "shift" (round 5): 1.57x faster od stage than exact
    # (1.206 vs 1.894 ms at 1080p, 267 ns/kp) AND better end-to-end
    # quality on the bundled pair (numFit 1815 @ 46.3% vs exact's
    # 1747 @ 44.5% at thresh 3.0; descriptor cosine vs exact median
    # 0.9998, border-keypoint tail documented in tests/test_tpu.py).
    # Unlike "fast", the gradient axes are exactly rotation-aligned, so
    # the ratio test keeps its discrimination on repetitive scenes.
    # fast_gradients=True overrides this to "fast" for back-compat.
    grad_mode: str = "shift"
    # How the subpixel-refine kernel addresses the DoG stack
    # (ops/pallas/refine.py). Mosaic's HBM DMA-slice alignment rules vary
    # by compiler version, so "auto" probes the backend ONCE per process
    # (pipeline._probe_refine_layout) and picks the fastest accepted tier:
    #   "lane8" — direct DMA into the stencil-padded DoG at 8-aligned lane
    #             offsets (no copies; strict Mosaics reject lane offsets
    #             they cannot prove divisible by the 128-lane tiling),
    #   "pair"  — direct DMA at 128-aligned offsets + a conditional second
    #             tile fetch for the ~2% of 3-column windows that cross a
    #             lane-tile edge (no copies; portable to strict Mosaics),
    #   "copy"  — legacy overlap-blocked HBM copy of the DoG stack
    #             (always compiles; ~120 MB extra HBM traffic at 1080p).
    # An explicit value pins the tier: no probe, no healing. Env override:
    # CUDASIFT_REFINE_LAYOUT skips the probe for "auto" params.
    refine_layout: str = "auto"
    # Candidate compaction via the count-gated Pallas kernel
    # (ops/pallas/compact.py) instead of the XLA radix-512 rank search.
    # Measured 0.65x on v5e at bench capacities (ROADMAP.md) — the XLA
    # form's cost scales with CAPACITY though, so this flag exists for
    # workloads that need capacity >> live count by much larger factors.
    use_pallas_compact: bool = False

    def octave_shapes(self, height: int, width: int) -> tuple[tuple[int, int], ...]:
        """Image shape per octave, index 0 = full working resolution.

        The working resolution is the input doubled when ``scale_up`` is set
        (cudaSiftH.cu:81-82); each octave halves via floor division
        (cudaSiftH.cu:146-167 operates on w/2, h/2).
        """
        h = height * (2 if self.scale_up else 1)
        w = width * (2 if self.scale_up else 1)
        shapes = []
        for _ in range(self.num_octaves):
            shapes.append((h, w))
            h //= 2
            w //= 2
        return tuple(shapes)

    @property
    def lowest_scale_effective(self) -> float:
        """lowestScale is doubled under scale_up (cudaSiftH.cu:127)."""
        return self.lowest_scale * (2.0 if self.scale_up else 1.0)

    def candidate_capacity(
        self, height: int, width: int, octave: int = 0
    ) -> int:
        """Fixed extrema-candidate slots for an octave of the given shape.

        Extrema density per pixel RISES ~3x per octave (the bundled pair at
        thresh 3.0: 1.3e-3 at octave 0 up to 16e-3 at octave 4), so the
        per-voxel fraction grows by an explicit (1, 4, 8, 16, 32) schedule,
        bounded by a 1/48-per-voxel ceiling. The schedule gives >=1.5x
        headroom over the densest per-octave extrema counts observed on the
        fixture at thresh 2.0. With the flat fraction the fixture saturated
        octaves 1-3 (righ.pgm dropped ~1465 candidates at thresh 3.0 that
        the reference keeps — it only clamps at the global maxPts,
        cudaSiftD.cu:1420) which cost ~11% of end-to-end features and ~9
        match-rate points. The compaction rank-search is the one stage
        whose cost scales with CAPACITY rather than live count (the
        refine/orient/descriptor kernels are count-gated), which is why the
        schedule is not simply 4**octave.
        """
        voxels = height * width * NUM_SCALES
        # Density keeps rising ~3x/octave past the measured range, so the
        # schedule keeps growing (and the per-voxel ceiling loosens) for
        # octave >= 5 — deep pyramids (num_octaves >= 7) must not re-create
        # the silent saturation this schedule exists to prevent. Deep
        # octaves are tiny, so the extra slots cost nothing.
        mult = (1, 4, 8, 16, 32)[min(octave, 4)] * 3 ** max(0, octave - 4)
        cap = int(voxels * self.candidate_fraction * mult)
        cap = min(cap, voxels // (48 if octave < 5 else 12))
        cap = max(self.min_candidates, cap)
        cap = min(cap, self.max_pts)
        # Round up to a lane multiple for friendlier TPU layouts.
        return (cap + 127) // 128 * 128

    @cached_property
    def laplace_kernels(self) -> np.ndarray:
        """(num_octaves, 8, 9) Gaussian tap table; octave 0 = full res.

        The reference's recursion passes ``initBlur=0`` for the top octave
        (cudaSiftH.cu:110) because the LowPass prefilter blur is treated as
        part of the image, and accumulates ScaleDown blur for lower octaves.
        """
        return laplace_kernels(self.num_octaves, 0.0)


@dataclasses.dataclass(frozen=True)
class MatchParams:
    """Static knobs of the brute-force matcher (matching.cu:1090-1206)."""

    tile_n2: int = 2048  # streaming tile along the second point set
    use_bf16: bool = False  # bfloat16 MXU inputs with f32 accumulation


@dataclasses.dataclass(frozen=True)
class HomographyParams:
    """Static knobs of RANSAC + refinement (matching.cu:1000, geomFuncs.cpp:6)."""

    num_loops: int = 1024
    min_score: float = 0.85
    max_ambiguity: float = 0.95
    thresh: float = 5.0
