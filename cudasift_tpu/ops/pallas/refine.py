"""Pallas TPU subpixel-refinement kernel.

TPU-native replacement for the gather stage of ``FindPointsMultiNew``
(cudaSiftD.cu:1379-1428). The XLA twin (``ops.detect.refine_candidates``)
gathers each candidate's 3x3x3 DoG cube through an x-widened channels-last
pack; XLA's gather runs at ~128 ns per index and processes every capacity
slot, which made refinement the most expensive stage of detection
(~2 ms at 1080p for ~1700 live candidates in 5120 slots).

This kernel consumes the (7, H, W) DoG stack DIRECTLY (plane index =
leading dim of the DMA source, so no channels-last transpose/pad pack is
ever materialized — the pack form cost ~0.6 ms of XLA relayout per 1080p
frame). Per candidate it:

- DMAs one (3, 16, 128) f32 tile — rows oy..oy+15, the 128-lane column
  block holding x-1..x+1, planes s..s+2 in a single strided copy (dim 0
  of a 3-D source has no sublane-alignment constraint); the B DMAs for a
  block are issued up front and overlap;
- lane-rolls each tile once by the in-block x offset and statically
  narrows to 32 lanes (lane 1+dx then holds column x+dx exactly);
- selects the nine (plane, row) combinations batched over the whole block
  with exact iota-==-masks (rows are per-candidate because oy is 8-aligned
  while y is not; one sum over a one-hot mask is bit-exact);
- runs the reference's refinement arithmetic — Hessian adjugate solve,
  +-0.5 Newton fallback, edge test, scale formula — batched over the whole
  block as (B, 1) column ops (the XLA twin's expressions verbatim, so the
  two paths agree bit for bit);
- is count-gated: programs past the live-candidate count skip everything.

Measured negative alternatives (ROADMAP.md): unaligned 3-row DMAs
(Mosaic requires 8-aligned sublane slices), dynamic-sublane row reads
(relayout), full iota-mask acquire of the channels-last pack (more VMEM
traffic than the rolls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.jit import tpu_jit

from ...config import NUM_SCALES

B = 64    # candidates per program (B=128's stacked tiles + unrolled roll
          # temps overflow the 16M scoped-VMEM limit on 1080p programs)
TR = 16   # DMA tile rows
TC = 128  # DMA tile lanes (one column block of a DoG plane)


def _refine_kernel(
    os_ref, oy_ref, ox_ref, rl_ref, cnt_ref,       # scalar prefetch
    dog_ref, meta_ref,                             # array inputs
    out_ref,                                       # (1, B, 8) output
    *scratch,                                      # tiles, cy, sems[, pair]
    lane_align, pair,
):
    blk = pl.program_id(0)
    total = cnt_ref[0]

    @pl.when(blk * B >= total)
    def _():
        out_ref[...] = jnp.zeros((1, B, 8), jnp.float32)

    @pl.when(blk * B < total)
    def _():
        _refine_body(
            blk, os_ref, oy_ref, ox_ref, rl_ref, cnt_ref, dog_ref,
            meta_ref, out_ref, scratch, lane_align, pair,
        )


def _refine_body(
    blk, os_ref, oy_ref, ox_ref, rl_ref, cnt_ref, dog_ref,
    meta_ref, out_ref, scratch, lane_align, pair,
):
    if pair:
        tiles, cy, sems, tiles2, sems2 = scratch
    else:
        tiles, cy, sems = scratch

    def copy(k, base, dst, sem):
        i = blk * B + k
        oy = pl.multiple_of(oy_ref[i], 8)
        ox = pl.multiple_of(ox_ref[i] + base, lane_align)
        # ONE (3, 16, 128) DMA per candidate: dim 0 of a 3-D HBM source has
        # no sublane-alignment constraint (only the trailing (sublane, lane)
        # pair is tiled), so the three scale planes move in a single
        # strided copy instead of three issues.
        return pltpu.make_async_copy(
            dog_ref.at[pl.ds(os_ref[i], 3), pl.ds(oy, TR), pl.ds(ox, TC)],
            dst.at[k],
            sem.at[k],
        )

    for k in range(B):
        copy(k, 0, tiles, sems).start()
        if pair:
            # 128-aligned fallback mode: when the 3-column window crosses
            # the lane-tile edge (rl > 125, ~1.6% of candidates), also
            # fetch the next 128-lane block.
            @pl.when(rl_ref[blk * B + k] > TC - 3)
            def _(k=k):
                copy(k, TC, tiles2, sems2).start()

    for k in range(B):
        i = blk * B + k
        copy(k, 0, tiles, sems).wait()
        rl = rl_ref[i]
        # One dynamic lane roll per candidate over the (3, 16, 128) tile,
        # then a static narrow to 32 lanes; row selection happens batched
        # below (rows are per-candidate because oy is 8-aligned while y is
        # not).
        shift = (TC - rl) % TC
        t = pltpu.roll(tiles[k], shift, axis=2)
        cy[k] = t[:, :, :32]
        if pair:
            @pl.when(rl > TC - 3)
            def _(k=k, rl=rl, shift=shift, t=t):
                copy(k, TC, tiles2, sems2).wait()
                # Lane c needs col ox+rl+c; for rl+c >= 128 that lives in
                # the second block at lane rl+c-128 = lane c of the SAME
                # cyclic roll applied to tiles2.
                t1 = pltpu.roll(tiles2[k], shift, axis=2)
                lane = jax.lax.broadcasted_iota(jnp.int32, (3, TR, 32), 2)
                cy[k] = jnp.where(lane + rl >= TC, t1[:, :, :32],
                                  t[:, :, :32])

    ryv = meta_ref[0, :, 3:4].astype(jnp.int32)           # (B, 1)
    riota = jax.lax.broadcasted_iota(jnp.int32, (B, TR), 1)
    planes = {}
    for ds in (-1, 0, 1):
        # Slice the candidate's plane block BEFORE masking: the masked
        # reduce then works on (B, 16, 32) temps instead of (B, 48, 32) —
        # the wide form put 9 live (B, 48, 32) f32 intermediates on the
        # Mosaic stack and blew the 16.76M scoped-VMEM limit at compile.
        tblk = cy[:, ds + 1]                              # (B, TR, 32)
        for dy in (-1, 0, 1):
            rsel = (riota == ryv + 1 + dy)
            planes[(ds, dy)] = jnp.sum(
                tblk * rsel.astype(jnp.float32)[:, :, None], axis=1
            )                                             # (B, 32)

    def at(ds, dy, dx):
        return planes[(ds, dy)][:, 1 + dx : 2 + dx]       # (B, 1)

    # ---- cudaSiftD.cu:1379-1428, identical expressions to the XLA twin
    # (ops.detect.refine_candidates) so both paths agree bit for bit. ----
    val = at(0, 0, 0)
    dxx = 2.0 * val - at(0, 0, -1) - at(0, 0, 1)
    dyy = 2.0 * val - at(0, -1, 0) - at(0, 1, 0)
    dxy = 0.25 * (at(0, 1, 1) + at(0, -1, -1) - at(0, -1, 1) - at(0, 1, -1))
    tra = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge_limit = meta_ref[0, 0, 4]
    lowest_scale = meta_ref[0, 0, 5]
    edge_ok = tra * tra < edge_limit * det
    det_safe = jnp.where(det == 0.0, 1e-30, det)
    edge = tra * tra / det_safe

    dx_ = 0.5 * (at(0, 0, 1) - at(0, 0, -1))
    dy_ = 0.5 * (at(0, 1, 0) - at(0, -1, 0))
    ds_ = 0.5 * (at(-1, 0, 0) - at(1, 0, 0))
    dss = 2.0 * val - at(1, 0, 0) - at(-1, 0, 0)
    dxs = 0.25 * (at(1, 0, 1) + at(-1, 0, -1) - at(-1, 0, 1) - at(1, 0, -1))
    dys = 0.25 * (at(1, 1, 0) + at(-1, -1, 0) - at(1, -1, 0) - at(-1, 1, 0))

    idxx = dyy * dss - dys * dys
    idxy = dys * dxs - dxy * dss
    idxs = dxy * dys - dyy * dxs
    denom = idxx * dxx + idxy * dxy + idxs * dxs
    idet = 1.0 / jnp.where(denom == 0.0, 1e-30, denom)
    idyy = dxx * dss - dxs * dxs
    idys = dxy * dxs - dxx * dys
    idss = dxx * dyy - dxy * dxy
    pdx = idet * (idxx * dx_ + idxy * dy_ + idxs * ds_)
    pdy = idet * (idxy * dx_ + idyy * dy_ + idys * ds_)
    pds = idet * (idxs * dx_ + idys * dy_ + idss * ds_)

    out_of_box = (
        (jnp.abs(pdx) > 0.5) | (jnp.abs(pdy) > 0.5) | (jnp.abs(pds) > 0.5)
    )

    def safe_div(a, b):
        return a / jnp.where(b == 0.0, 1e-30, b)

    pdx = jnp.where(out_of_box, safe_div(dx_, dxx), pdx)
    pdy = jnp.where(out_of_box, safe_div(dy_, dyy), pdy)
    pds = jnp.where(out_of_box, safe_div(ds_, dss), pds)
    dval = 0.5 * (dx_ * pdx + dy_ * pdy + ds_ * pds)

    factor = jnp.float32(1.0 / NUM_SCALES)
    svec = meta_ref[0, :, 0:1]
    yvec = meta_ref[0, :, 1:2]
    xvec = meta_ref[0, :, 2:3]
    sc = jnp.exp2(svec * factor) * jnp.exp2(pds * factor)

    slot = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0) + blk * B
    in_range = slot < cnt_ref[0]
    valid = in_range & edge_ok & (sc >= lowest_scale)
    vf = valid.astype(jnp.float32)

    z = jnp.zeros((B, 1), jnp.float32)
    out = jnp.concatenate(
        [
            jnp.where(valid, xvec + pdx, 0.0),
            jnp.where(valid, yvec + pdy, 0.0),
            jnp.where(valid, sc, 0.0),
            jnp.where(valid, val + dval, 0.0),
            jnp.where(valid, edge, 0.0),
            vf,
            z,
            z,
        ],
        axis=1,
    )                                                            # (B, 8)
    out_ref[0] = out


@tpu_jit(
    static_argnames=("edge_limit", "lowest_scale", "interpret",
                     "logical_shape", "lane8"),
)
def refine_candidates_pallas(
    dog: jnp.ndarray,
    flat_idx: jnp.ndarray,
    count: jnp.ndarray,
    edge_limit: float,
    lowest_scale: float,
    interpret: bool = False,
    logical_shape: tuple[int, int] | None = None,
    lane8: bool = True,
):
    """Pallas twin of ``ops.detect.refine_candidates``.

    Returns the same per-slot field tuple (xpos, ypos, scale, sharpness,
    edgeness, valid) as (K,) arrays. ``dog`` is the (7, H, W) DoG stack,
    consumed in its native planar layout.

    ``logical_shape=(h, w)``: ``dog`` is the RAW stencil output
    (``dog_and_mask_pallas(..., raw=True)``) — physically (7, HP>=h, WR>=w)
    with clamp-padded values beyond (h, w) — and ``flat_idx`` indexes the
    logical (h, w) grid. DMA tiles are addressed with 8-aligned lane
    offsets directly into that layout, so no padded/overlapping copy of the
    stack is ever materialized (the copy is ~120 MB of HBM traffic at
    1080p). An 8-aligned ``ox`` caps the in-tile column offset at
    125 = 127 - 2, so the 3-column window x-1..x+1 never crosses the
    128-lane tile edge — the wraparound that forces the overlapping-block
    layout in the legacy path below cannot occur.
    """
    nsc, hphys, wphys = dog.shape
    k_in = flat_idx.shape[0]
    pad = (-k_in) % B
    if pad:
        flat_idx = jnp.pad(flat_idx, (0, pad))
    k = flat_idx.shape[0]

    if logical_shape is not None:
        h, w = logical_shape
        assert hphys >= max(h, TR) and wphys >= max(w, TC) and wphys % TC == 0
        dogp = dog
        s = flat_idx // (h * w)
        rem = flat_idx - s * (h * w)
        y = rem // w
        x = rem - y * w
        y = jnp.clip(y, 1, h - 2)
        x = jnp.clip(x, 1, w - 2)
        oy = jnp.minimum((y - 1) // 8 * 8, hphys - TR)
        ry = (y - 1) - oy
        if lane8:
            ox = jnp.minimum((x - 1) // 8 * 8, wphys - TC)
            rl = (x - 1) - ox      # in [0, 125]: clamp slack < 128 - 2
            lane_align, pair = 8, False
        else:
            # 128-aligned fallback: rl reaches 127, so windows with
            # rl > 125 fetch the next lane block too (kernel `pair` mode).
            # Note wphys-TC clamping keeps rl <= 125 exactly when the next
            # block would not exist, so the pair fetch is always in-bounds.
            ox = jnp.minimum((x - 1) // TC * TC, wphys - TC)
            rl = (x - 1) - ox      # in [0, 127]
            lane_align, pair = TC, True
    else:
        h, w = hphys, wphys
        # Overlapping-block column layout: block b holds source columns
        # [126*b, 126*b + 128), so any 3-column window x-1..x+1 lies inside
        # ONE 128-lane block (a plain 128-aligned layout fails when
        # (x-1) % 128 >= 126 — the window would cross the tile edge and the
        # cyclic roll wraps in wrong data). Built as an XLA concat of
        # slices: a linear-bandwidth copy (~1.6% duplication), NOT the
        # ~0.6 ms channels-last transpose relayout the previous pack needed.
        span = TC - 2
        nblk = max(1, -(-(w - 2) // span))
        wpad = (nblk - 1) * span + TC
        # Rows padded to a sublane multiple: the oy clamp below saturates at
        # hp - TR, which must itself be 8-aligned or the kernel's
        # multiple_of(oy, 8) promise (and Mosaic's sublane DMA-offset rule)
        # is violated for bottom-edge candidates on octaves whose height is
        # not a multiple of 8 (e.g. h=135, 67 in a 1080p pyramid).
        hp = max(-(-h // 8) * 8, TR)
        dogp = jnp.pad(dog, ((0, 0), (0, hp - h), (0, wpad - w)))
        dogp = jnp.concatenate(
            [dogp[:, :, b * span : b * span + TC] for b in range(nblk)],
            axis=2,
        )

        s = flat_idx // (h * w)
        rem = flat_idx - s * (h * w)
        y = rem // w
        x = rem - y * w
        y = jnp.clip(y, 1, h - 2)
        x = jnp.clip(x, 1, w - 2)
        # oy is 8-aligned and clamped so the 16-row tile stays in bounds;
        # the residual ry = (y-1) - oy stays in [0, 13].
        oy = jnp.minimum((y - 1) // 8 * 8, hp - TR)
        ry = (y - 1) - oy
        blk = (x - 1) // span
        ox = blk * TC
        rl = (x - 1) - blk * span
        lane_align, pair = TC, False

    from ..scan import lane_stack

    meta = lane_stack(
        [
            s,
            y,
            x,
            ry,
            jnp.full((k,), edge_limit, jnp.float32),
            jnp.full((k,), lowest_scale, jnp.float32),
            jnp.zeros((k,), jnp.float32),
            jnp.zeros((k,), jnp.float32),
        ],
    ).reshape(k // B, B, 8)

    nb = k // B
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, B, 8), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, 8), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B, 3, TR, TC), jnp.float32),
            pltpu.VMEM((B, 3, TR, 32), jnp.float32),
            pltpu.SemaphoreType.DMA((B,)),
        ] + ([
            pltpu.VMEM((B, 3, TR, TC), jnp.float32),
            pltpu.SemaphoreType.DMA((B,)),
        ] if pair else []),
    )
    out = pl.pallas_call(
        functools.partial(_refine_kernel, lane_align=lane_align, pair=pair),
        out_shape=jax.ShapeDtypeStruct((nb, B, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(s, oy, ox, rl, jnp.atleast_1d(jnp.asarray(count, jnp.int32)),
      dogp, meta)
    out = out.reshape(k, 8)[:k_in]
    return (
        out[:, 0], out[:, 1], out[:, 2], out[:, 3], out[:, 4],
        out[:, 5] > 0.5,
    )
