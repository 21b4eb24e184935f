"""Pallas TPU subpixel-refinement kernel.

TPU-native replacement for the gather stage of ``FindPointsMultiNew``
(cudaSiftD.cu:1379-1428). The XLA twin (``ops.detect.refine_candidates``)
gathers each candidate's 3x3x3 DoG cube through an x-widened channels-last
pack; XLA's gather runs at ~128 ns per index and processes every capacity
slot, which made refinement the most expensive stage of detection
(~2 ms at 1080p for ~1700 live candidates in 5120 slots).

This kernel instead:

- DMAs one (16, 256) f32 tile per candidate from a channels-last DoG pack
  ``(H, W*8)`` — the tile covers rows y-1..y+1 and all scale channels of
  x-1..x+1; DMAs for a whole block are issued up front and overlap;
- acquires each candidate's 3x3x3 cube from its tile either by batched
  iota-mask selection over the whole (B, 16, 256) block (``matsel``, the
  default) or by two dynamic rolls per candidate (lane roll folding sub-tile
  alignment + scale-channel selection, then a narrowed sublane roll); both
  produce bit-identical values;
- runs the reference's refinement arithmetic — Hessian adjugate solve,
  +-0.5 Newton fallback, edge test, scale formula — batched over the whole
  block as (B, 1) column ops (the XLA twin's expressions verbatim, so the
  two paths agree bit for bit);
- is count-gated: programs past the live-candidate count skip everything.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import NUM_SCALES

B = 128   # candidates per program
TR = 16   # DMA tile rows
TC = 256  # DMA tile lanes (channels-last flat columns)


def _refine_kernel(
    oy_ref, ox_ref, ry_ref, rl_ref, cnt_ref,       # scalar prefetch
    pack_ref, meta_ref,                            # array inputs
    out_ref,                                       # (1, B, 8) output
    tiles, cy0, cy1, cy2, sems,                    # scratch
    *, matsel,
):
    blk = pl.program_id(0)
    total = cnt_ref[0]

    @pl.when(blk * B >= total)
    def _():
        out_ref[...] = jnp.zeros((1, B, 8), jnp.float32)

    @pl.when(blk * B < total)
    def _():
        _refine_body(
            blk, oy_ref, ox_ref, ry_ref, rl_ref, cnt_ref, pack_ref,
            meta_ref, out_ref, tiles, cy0, cy1, cy2, sems, matsel=matsel,
        )


def _refine_body(
    blk, oy_ref, ox_ref, ry_ref, rl_ref, cnt_ref, pack_ref,
    meta_ref, out_ref, tiles, cy0, cy1, cy2, sems, *, matsel,
):
    def copy(k):
        i = blk * B + k
        oy = pl.multiple_of(oy_ref[i], 8)
        ox = pl.multiple_of(ox_ref[i], 128)
        return pltpu.make_async_copy(
            pack_ref.at[pl.ds(oy, TR), pl.ds(ox, TC)],
            tiles.at[k],
            sems.at[k],
        )

    for k in range(B):
        copy(k).start()

    if matsel:
        # Batched iota-mask selection instead of per-candidate rolls.
        # Every needed cube value is ONE element of the candidate's
        # (16, 256) tile; select it with an exact ==-mask multiply and a
        # reduce (the sum touches exactly one nonzero, so this is bit-exact
        # like the rolls). The whole block is processed as (B, 16, 256)
        # vector ops — no 128x-unrolled dynamic rolls. (An unaligned 3-row
        # DMA per candidate would avoid the row selection entirely, but
        # Mosaic requires 8-aligned sublane slices of HBM.)
        for k in range(B):
            copy(k).wait()
        t3 = tiles[...]                                        # (B, TR, TC)
        ryv = meta_ref[0, :, 3:4].astype(jnp.int32)            # (B, 1)
        rlv = meta_ref[0, :, 6:7].astype(jnp.int32)            # (B, 1)
        riota = jax.lax.broadcasted_iota(jnp.int32, (B, TR), 1)
        planes = []
        for dy in range(3):
            rowm = (riota == ryv + dy).astype(jnp.float32)     # (B, TR)
            planes.append(jnp.sum(t3 * rowm[:, :, None], axis=1))  # (B, TC)
        ciota = jax.lax.broadcasted_iota(jnp.int32, (B, TC), 1)

        def at(ds, dy, dx):
            j = (1 + dx) * 8 + 1 + ds
            cm = (ciota == rlv + j).astype(jnp.float32)
            return jnp.sum(planes[dy + 1] * cm, axis=1, keepdims=True)
    else:
        for k in range(B):
            i = blk * B + k
            copy(k).wait()
            ry = ry_ref[i]
            rl = rl_ref[i]
            # Lane-align first, then statically narrow to 32 lanes BEFORE
            # the sublane roll: the rolls commute (independent axes), and
            # rolling rows on (16, 32) instead of (16, 256) cuts the
            # dynamic-roll data 8x on that axis (measured ~1.2x whole-kernel
            # win at 1080p o0).
            t = pltpu.roll(tiles[k], (TC - rl) % TC, axis=1)
            t32 = pltpu.roll(t[:, :32], (TR - ry) % TR, axis=0)
            cy0[k : k + 1] = t32[0:1]
            cy1[k : k + 1] = t32[1:2]
            cy2[k : k + 1] = t32[2:3]

        rows = (cy0[...], cy1[...], cy2[...])

        def at(ds, dy, dx):
            j = (1 + dx) * 8 + 1 + ds
            return rows[dy + 1][:, j : j + 1]                    # (B, 1)

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


@functools.partial(
    jax.jit,
    static_argnames=("edge_limit", "lowest_scale", "interpret", "matsel"),
)
def refine_candidates_pallas(
    dog: jnp.ndarray,
    flat_idx: jnp.ndarray,
    count: jnp.ndarray,
    edge_limit: float,
    lowest_scale: float,
    interpret: bool = False,
    matsel: bool = True,
):
    """Pallas twin of ``ops.detect.refine_candidates``.

    Returns the same per-slot field tuple (xpos, ypos, scale, sharpness,
    edgeness, valid) as (K,) arrays. ``dog`` is the (7, H, W) DoG stack.

    ``matsel``: acquire each candidate's 3x3x3 cube by batched iota-mask
    selection over the whole (B, 16, 256) tile block instead of two dynamic
    rolls per candidate (bit-identical output; the rolls were ~60% of the
    kernel at 1080p octave 0).
    """
    nsc, h, w = dog.shape
    k_in = flat_idx.shape[0]
    pad = (-k_in) % B
    if pad:
        flat_idx = jnp.pad(flat_idx, (0, pad))
    k = flat_idx.shape[0]

    # Channels-last flat pack (H, W*8): lane x*8 + c holds dog[c, y, x].
    packed = jnp.pad(jnp.moveaxis(dog, 0, -1), ((0, 0), (0, 0), (0, 8 - nsc)))
    packf = packed.reshape(h, w * 8)
    packf = jnp.pad(packf, ((0, TR), (0, TC)))

    s = flat_idx // (h * w)
    rem = flat_idx - s * (h * w)
    y = rem // w
    x = rem - y * w
    y = jnp.clip(y, 1, h - 2)
    x = jnp.clip(x, 1, w - 2)
    lx0 = (x - 1) * 8
    ox = lx0 // 128 * 128
    rl = lx0 - ox + s
    oy = (y - 1) // 8 * 8
    ry = (y - 1) - oy

    meta = jnp.stack(
        [
            s.astype(jnp.float32),
            y.astype(jnp.float32),
            x.astype(jnp.float32),
            ry.astype(jnp.float32),
            jnp.full((k,), edge_limit, jnp.float32),
            jnp.full((k,), lowest_scale, jnp.float32),
            rl.astype(jnp.float32),
            jnp.zeros((k,), jnp.float32),
        ],
        axis=-1,
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
            pltpu.VMEM((B, TR, TC), jnp.float32),
            pltpu.VMEM((B, 32), jnp.float32),
            pltpu.VMEM((B, 32), jnp.float32),
            pltpu.VMEM((B, 32), jnp.float32),
            pltpu.SemaphoreType.DMA((B,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_refine_kernel, matsel=matsel),
        out_shape=jax.ShapeDtypeStruct((nb, B, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy, ox, ry, rl, jnp.atleast_1d(jnp.asarray(count, jnp.int32)), packf, meta)
    out = out.reshape(k, 8)[:k_in]
    return (
        out[:, 0], out[:, 1], out[:, 2], out[:, 3], out[:, 4],
        out[:, 5] > 0.5,
    )
