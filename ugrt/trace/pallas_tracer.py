"""Fused Pallas TPU kernel for the work-item intersection sweep.

This replaces the XLA gather + elementwise + reduce pipeline of
ugrt.trace.primary._work_chunk_min with a single Mosaic kernel — the TPU
analog of the reference's shared-memory inner loop (rckernel_alpha,
/root/reference/trace_kernel.cu:147-215): where a CUDA block stages 64
triangles into shared memory and tests 64 rays against them, a kernel
program here DMAs a [B x 16] triangle slab from HBM into VMEM and
evaluates the full [B x R] Möller–Trumbore block on the VPU.

Layout (chosen for Mosaic's DMA alignment rules — dynamic slice offsets
must divide the tiling, 8 on sublanes / 128 on lanes):
  * triangle data is pre-gathered once per frame into an 8-ALIGNED padded
    pair layout tri_rows [cap8, 16] (pairs on sublanes, components on
    lanes; per-cell segments start at multiples of 8) so a work item's
    slab [B, 16] is a sublane slice at an 8-divisible offset;
  * rays per tile are rays_T [T, 8, 64] (components on sublanes, rays on
    lanes), so ray broadcasts need no in-kernel transposes;
  * the [B, R] intersection block puts triangles on sublanes and rays on
    lanes; min/argmin reduce over sublanes to [R];
  * each grid step processes `wchunk` work items with double-buffered
    DMA, amortizing per-program overhead;
  * the cross-item segment-min stays in XLA (cheap).

The kernel is combinatorial-forward only; gradients flow through
ugrt.trace.refine as usual.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ugrt.config import RenderConfig
from ugrt.grid.build import DeviceGrid

_BIG = 3.0e38  # plain float: a jnp scalar would be a captured const

# tri row layout: 0:3 tvec (eye - v0), 3:6 e1, 6:9 e2, rest pad.
# Mosaic requires HBM DMA slices whose lane (last-dim) extent is a
# multiple of 128, so component rows are padded to a full 128 lanes —
# an 8x overfetch per slab (64 KB instead of 8 KB) that costs ~2 ms/frame
# of HBM bandwidth at the flagship workload; revisit with a packed layout
# if it ever shows up in profiles.
_TRI_COLS = 128
_ALIGN = 8  # sublane tiling — padded cell segments start at multiples


class PaddedLayout(NamedTuple):
    """DMA-ready triangle slab layout (one gather, no relocation)."""

    tri_rows: jax.Array      # [cap8, 128] float32 (cols 0:9 live)
    padded_faces: jax.Array  # [cap8] int32 face id per pair (-1 pad)


def pack_tri_data(vertices, faces, grid: DeviceGrid, eye,
                  cfg: RenderConfig) -> PaddedLayout:
    """Gather triangle data in sorted-pair order, DMA-padded.

    Requires a grid built with align=8 (ugrt.grid.build, align arg): cell
    segments already start at 8-aligned offsets with face=-1 padding rows
    in place, so this is a single row gather — no scatter.  Rows hold
    (eye - v0, v1 - v0, v2 - v0), the staging of trace_kernel.cu:149-175,
    padded to 128 component lanes for Mosaic DMA alignment; two extra
    triangle batches of rows guard the final partial slab.
    """
    fidx = jnp.clip(grid.sorted_faces, 0, faces.shape[0] - 1)
    v = vertices[faces[fidx]]            # [cap8, 3, 3]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    tvec = eye[None, :] - v0
    data = jnp.concatenate([tvec, e1, e2], axis=1)   # [cap8, 9]

    guard = 2 * cfg.tri_batch
    tri_rows = jnp.pad(data, ((0, guard), (0, _TRI_COLS - 9)))
    padded_faces = jnp.pad(grid.sorted_faces, (0, guard),
                           constant_values=-1)
    return PaddedLayout(tri_rows, padded_faces)


def _mt_block(tri, rays, count, cfg: RenderConfig):
    """[B x R] Möller–Trumbore on the VPU.

    tri: [B, 128] slab (cols 0:9 live); rays: [8, R] (rows 0:3 dir);
    count: live tris.
    Returns t [B, R] with _BIG for rejects/pad, |t| quirk applied.
    """
    B = tri.shape[0]
    R = rays.shape[1]

    def rrow(i):  # ray component as [1, R]
        return rays[i, :][None, :]

    def tcol(i):  # triangle component as [B, 1]
        return tri[:, i][:, None]

    dx, dy, dz = rrow(0), rrow(1), rrow(2)
    tvx, tvy, tvz = tcol(0), tcol(1), tcol(2)
    e1x, e1y, e1z = tcol(3), tcol(4), tcol(5)
    e2x, e2y, e2z = tcol(6), tcol(7), tcol(8)

    # pvec = dir x e2
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = 1.0 / det
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec x e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    if cfg.quirks.abs_t:
        t = jnp.abs(t)

    row = jax.lax.broadcasted_iota(jnp.int32, (B, R), 0)
    reject = ((jnp.abs(det) < jnp.float32(cfg.epsilon))
              | (u < 0) | (u > 1) | (v < 0) | (u + v > 1)
              | (t <= 0) | (row >= count))
    return jnp.where(reject, jnp.float32(_BIG), t)


def _shadow_block(tri, rays, count, cell, cfg: RenderConfig):
    """[B x R] occlusion test (intersectTri + isSmaller,
    light_kernel.cu:13-50, :1-11).

    tri: [B, 128] slab (tvec = L - v0); rays: [8, R] rows 0:3 shadow dir,
    row 3 = dist(light, point), row 4 = the ray's light-cell id (f32).
    cell: this work item's cell id (int32 scalar) — lanes whose cell
    differs are masked, which is how a fixed 64-ray block spanning
    several cell runs stays exact.  Signed t, any t != 0 below 999999.9
    accepts (negative included — the reference quirk); shadowed when
    |occluder - L| + eps < dist.  Returns int32 [R] (OR over triangles).
    """
    B = tri.shape[0]
    R = rays.shape[1]

    def rrow(i):
        return rays[i, :][None, :]

    def tcol(i):
        return tri[:, i][:, None]

    dx, dy, dz = rrow(0), rrow(1), rrow(2)
    dist_pt = rrow(3)
    live_ray = rrow(4) == cell.astype(jnp.float32)
    tvx, tvy, tvz = tcol(0), tcol(1), tcol(2)
    e1x, e1y, e1z = tcol(3), tcol(4), tcol(5)
    e2x, e2y, e2z = tcol(6), tcol(7), tcol(8)

    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = 1.0 / det
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

    row = jax.lax.broadcasted_iota(jnp.int32, (B, R), 0)
    reject = ((jnp.abs(det) < jnp.float32(cfg.epsilon))
              | (u < 0) | (u > 1) | (v < 0) | (u + v > 1)
              | (row >= count) | ~live_ray)
    hit = (~reject) & (t != 0) & (t < jnp.float32(999999.9))
    if not cfg.quirks.shadow_accept_negative_t:
        hit = hit & (t > 0)

    ox = t * dx
    oy = t * dy
    oz = t * dz
    dist_occ = jnp.sqrt(ox * ox + oy * oy + oz * oz)
    sh = hit & (dist_occ + jnp.float32(cfg.shadow_epsilon) < dist_pt)
    return jnp.max(sh.astype(jnp.int32), axis=0)          # [R]


def _shadow_sweep_kernel(packed_ref, blkcell_ref, tri_hbm, rays_hbm,
                         sh_out, tri_vmem, ray_vmem, sems, *,
                         cfg: RenderConfig, wchunk: int, B: int, R: int):
    """Shadow work-item sweep (mod_light_rckernel analog).

    Scalar budget: SMEM is ~1 MB, so per-item descriptors are packed into
    TWO int32 arrays — packed = (offset // 8) * 256 + count (offset is
    8-aligned by construction, count <= tri_batch <= 255) and
    blkcell = block * 32768 + cell (cell < 2^15, block <= 2^14).
    """
    pid = pl.program_id(0)

    def off_of(item):
        return pl.multiple_of((packed_ref[item] // 256) * _ALIGN, _ALIGN)

    def cnt_of(item):
        return jax.lax.rem(packed_ref[item], 256)

    def blk_of(item):
        return blkcell_ref[item] // 32768

    def cell_of(item):
        return jax.lax.rem(blkcell_ref[item], 32768)

    def tri_dma(slot, item):
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(off_of(item), B), :], tri_vmem.at[slot],
            sems.at[slot])

    def ray_dma(slot, item):
        return pltpu.make_async_copy(
            rays_hbm.at[blk_of(item)], ray_vmem.at[slot],
            sems.at[2 + slot])

    first = pid * wchunk

    @pl.when(cnt_of(first) > 0)
    def _():
        tri_dma(0, first).start()
        ray_dma(0, first).start()

    def body(k, _):
        item = first + k
        cur = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when((k + 1 < wchunk) & (cnt_of(item + 1) > 0))
        def _():
            tri_dma(nxt, item + 1).start()
            ray_dma(nxt, item + 1).start()

        @pl.when(cnt_of(item) > 0)
        def _():
            tri_dma(cur, item).wait()
            ray_dma(cur, item).wait()
            sh_out[k, :] = _shadow_block(
                tri_vmem[cur], ray_vmem[cur], cnt_of(item),
                cell_of(item), cfg)

        @pl.when(cnt_of(item) == 0)
        def _():
            sh_out[k, :] = jnp.zeros((R,), dtype=jnp.int32)

        return 0

    jax.lax.fori_loop(0, wchunk, body, 0)


# Scalar-prefetch SMEM budget: two int32 arrays per sweep call; slices
# keep each call's descriptors comfortably under SMEM capacity.
_SWEEP_SLICE = 32768


def shadow_sweep_pallas(tri_rows, rays_blk, work_offset, work_count,
                        work_block, work_cell, *, cfg: RenderConfig,
                        wchunk: int = 8, interpret: bool = False):
    """Per-work-item shadow flags via the Pallas kernel.

    tri_rows: [cap8, 128] (tvec = light - v0); rays_blk: [NB+1, 8, 128]
    sorted-stream ray blocks (row 4 = ray cell id); work_*: [Wcap] int32.
    Returns sh [Wcap, 128] int32 (caller slices to the live ray count).
    Large work lists are processed in SMEM-safe slices.
    """
    wcap = work_offset.shape[0]
    if wcap > _SWEEP_SLICE:
        outs = []
        for s in range(0, wcap, _SWEEP_SLICE):
            e = min(s + _SWEEP_SLICE, wcap)
            outs.append(_shadow_sweep_call(
                tri_rows, rays_blk, work_offset[s:e], work_count[s:e],
                work_block[s:e], work_cell[s:e], cfg=cfg, wchunk=wchunk,
                interpret=interpret))
        return jnp.concatenate(outs, axis=0)
    return _shadow_sweep_call(tri_rows, rays_blk, work_offset, work_count,
                              work_block, work_cell, cfg=cfg,
                              wchunk=wchunk, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "wchunk", "interpret"))
def _shadow_sweep_call(tri_rows, rays_blk, work_offset, work_count,
                       work_block, work_cell, *, cfg: RenderConfig,
                       wchunk: int = 8, interpret: bool = False):
    B = cfg.tri_batch
    R = rays_blk.shape[2]
    wcap = work_offset.shape[0]
    n_prog = -(-wcap // wchunk)
    pad = n_prog * wchunk - wcap

    packed = (work_offset // _ALIGN) * 256 + jnp.clip(work_count, 0, 255)
    packed = jnp.pad(packed.astype(jnp.int32), (0, pad + 1))
    pkts = jnp.pad(work_block * 32768 + work_cell, (0, pad + 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((wchunk, R), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, _TRI_COLS), jnp.float32),
            pltpu.VMEM((2, 8, R), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    kernel = functools.partial(_shadow_sweep_kernel, cfg=cfg,
                               wchunk=wchunk, B=B, R=R)
    (sh_out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_prog * wchunk, R), jnp.int32),
        ],
        interpret=interpret,
    )(packed, pkts, tri_rows, rays_blk)
    return sh_out[:wcap]


def pack_shadow_tri_data(vertices, faces, grid: DeviceGrid, light,
                         cfg: RenderConfig) -> PaddedLayout:
    """Like pack_tri_data but tvec = light - v0 (light_kernel.cu:144-146)."""
    return pack_tri_data(vertices, faces, grid, light, cfg)


def _sweep_kernel(offs_ref, cnts_ref, tiles_ref, tri_hbm, rays_hbm,
                  t_out, i_out, tri_vmem, ray_vmem, sems, *,
                  cfg: RenderConfig, wchunk: int, B: int, R: int):
    """One grid step = wchunk work items, double-buffered slab DMA."""
    pid = pl.program_id(0)

    def tri_dma(slot, item):
        off = pl.multiple_of(offs_ref[item], _ALIGN)
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(off, B), :], tri_vmem.at[slot],
            sems.at[slot])

    def ray_dma(slot, item):
        return pltpu.make_async_copy(
            rays_hbm.at[tiles_ref[item]], ray_vmem.at[slot],
            sems.at[2 + slot])

    first = pid * wchunk

    @pl.when(cnts_ref[first] > 0)
    def _():
        tri_dma(0, first).start()
        ray_dma(0, first).start()

    def body(k, _):
        item = first + k
        cur = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when((k + 1 < wchunk) & (cnts_ref[item + 1] > 0))
        def _():
            tri_dma(nxt, item + 1).start()
            ray_dma(nxt, item + 1).start()

        @pl.when(cnts_ref[item] > 0)
        def _():
            tri_dma(cur, item).wait()
            ray_dma(cur, item).wait()
            t = _mt_block(tri_vmem[cur], ray_vmem[cur], cnts_ref[item],
                          cfg)
            tmin = jnp.min(t, axis=0)                       # [R]
            win = jnp.argmin(t, axis=0).astype(jnp.int32)   # [R]
            t_out[k, :] = tmin
            i_out[k, :] = offs_ref[item] + win

        @pl.when(cnts_ref[item] == 0)
        def _():
            t_out[k, :] = jnp.full((R,), _BIG, dtype=jnp.float32)
            i_out[k, :] = jnp.zeros((R,), dtype=jnp.int32)

        return 0

    jax.lax.fori_loop(0, wchunk, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "wchunk", "interpret"))
def work_sweep_pallas(tri_rows, rays_T, work_offset, work_count,
                      work_tile, *, cfg: RenderConfig, wchunk: int = 8,
                      interpret: bool = False):
    """Per-work-item (min t, winner PADDED pair index) via Pallas.

    tri_rows: [cap8, 16]; rays_T: [T, 8, R]; work_*: [Wcap] int32 with
    offsets into the PADDED layout (multiples of 8).
    Returns (tmin [Wcap, R], pair [Wcap, R] — indices into the padded
    layout).
    """
    B = cfg.tri_batch
    R = rays_T.shape[2]
    wcap = work_offset.shape[0]
    n_prog = -(-wcap // wchunk)
    pad = n_prog * wchunk - wcap

    offs = jnp.pad(work_offset, (0, pad + 1))
    cnts = jnp.pad(work_count, (0, pad + 1))
    tiles = jnp.pad(work_tile, (0, pad + 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # tri_rows (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # rays_T (HBM)
        ],
        out_specs=[
            pl.BlockSpec((wchunk, R), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wchunk, R), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, _TRI_COLS), jnp.float32),
            pltpu.VMEM((2, 8, R), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    kernel = functools.partial(_sweep_kernel, cfg=cfg, wchunk=wchunk,
                               B=B, R=R)
    t_out, i_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_prog * wchunk, R), jnp.float32),
            jax.ShapeDtypeStruct((n_prog * wchunk, R), jnp.int32),
        ],
        interpret=interpret,
    )(offs, cnts, tiles, tri_rows, rays_T)
    return t_out[:wcap], i_out[:wcap]
