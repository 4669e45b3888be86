"""Fused Pallas TPU kernel for the work-item intersection sweep.

This replaces the XLA gather + elementwise + reduce pipeline of
ugrt.trace.primary._work_chunk_min with a single Mosaic kernel — the TPU
analog of the reference's shared-memory inner loop (rckernel_alpha,
/root/reference/trace_kernel.cu:147-215): where a CUDA block stages 64
triangles into shared memory and tests 64 rays against them, a kernel
program here DMAs a [16 x B] transposed triangle slab from HBM into VMEM
and evaluates the full [64 x B] Möller–Trumbore block on the VPU.

Layout choices (see pallas guide):
  * triangle data is pre-gathered once per frame into pair order and
    TRANSPOSED: tri_T [16, capacity] — components on sublanes, pairs on
    lanes, so a work item's slab is a contiguous [16, B] lane slice;
  * rays per tile are [64, 8] (xyz + eye padded to 8 lanes);
  * each grid step processes WCHUNK work items with double-buffered DMA,
    amortizing per-program overhead;
  * outputs are per-item (min t [64], winner lane [64]); the cross-item
    segment-min stays in XLA (cheap).

The kernel is combinatorial-forward only; gradients flow through
ugrt.trace.refine as usual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ugrt.config import RenderConfig
from ugrt.grid.build import DeviceGrid

_BIG = 3.0e38  # plain float: jnp scalars would be captured consts in the kernel

# tri_T row layout: 0:3 tvec (eye - v0), 3:6 e1, 6:9 e2, rest pad.
_TRI_ROWS = 16


def pack_tri_data(vertices, faces, grid: DeviceGrid, eye):
    """Pre-gather triangle data into sorted-pair order, transposed.

    Returns tri_T [16, capacity] float32 with rows (tvec, e1, e2) — the
    (eye - v0, v1 - v0, v2 - v0) staging of trace_kernel.cu:149-175.
    """
    cap = grid.sorted_faces.shape[0]
    fidx = jnp.clip(grid.sorted_faces, 0, faces.shape[0] - 1)
    v = vertices[faces[fidx]]            # [cap, 3, 3]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    tvec = eye[None, :] - v0
    data = jnp.concatenate([tvec, e1, e2], axis=1)   # [cap, 9]
    data = jnp.pad(data, ((0, 0), (0, _TRI_ROWS - 9)))
    return data.T                                     # [16, cap]


def _mt_block(tri, rays, count, cfg: RenderConfig):
    """[R x B] Möller–Trumbore on the VPU.

    tri: [16, B] slab; rays: [R, 8] (cols 0:3 dir); count: live tris.
    Returns (t [R, B]) with _BIG for rejects/pad, |t| quirk applied.
    """
    B = tri.shape[1]
    R = rays.shape[0]

    def rrow(i):  # ray component as [R, 1]
        return rays[:, i][:, None]

    def trow(i):  # triangle component as [1, B]
        return tri[i, :][None, :]

    dx, dy, dz = rrow(0), rrow(1), rrow(2)
    tvx, tvy, tvz = trow(0), trow(1), trow(2)
    e1x, e1y, e1z = trow(3), trow(4), trow(5)
    e2x, e2y, e2z = trow(6), trow(7), trow(8)

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

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, B), 1)
    reject = ((jnp.abs(det) < jnp.float32(cfg.epsilon))
              | (u < 0) | (u > 1) | (v < 0) | (u + v > 1)
              | (t <= 0) | (lane >= count))
    return jnp.where(reject, jnp.float32(_BIG), t)


def _sweep_kernel(offs_ref, cnts_ref, tiles_ref, tri_hbm, rays_hbm,
                  t_out, i_out, tri_vmem, ray_vmem, sems, *,
                  cfg: RenderConfig, wchunk: int, B: int, R: int):
    """One grid step = wchunk work items, double-buffered slab DMA."""
    pid = pl.program_id(0)

    def tri_dma(slot, item):
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(offs_ref[item], B)],
            tri_vmem.at[slot], sems.at[slot])

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
            tmin = jnp.min(t, axis=1)
            win = jnp.argmin(t, axis=1).astype(jnp.int32)
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
def work_sweep_pallas(tri_T, rays_tiled, work_offset, work_count,
                      work_tile, *, cfg: RenderConfig, wchunk: int = 8,
                      interpret: bool = False):
    """Per-work-item (min t, winner pair index) via the Pallas kernel.

    tri_T: [16, capacity]; rays_tiled: [T, R, 8]; work_*: [Wcap] int32.
    Returns (tmin [Wcap, R], pair [Wcap, R]).
    """
    B = cfg.tri_batch
    R = rays_tiled.shape[1]
    wcap = work_offset.shape[0]
    n_prog = -(-wcap // wchunk)
    pad = n_prog * wchunk - wcap

    offs = jnp.pad(work_offset, (0, pad + 1))
    cnts = jnp.pad(work_count, (0, pad + 1))
    tiles = jnp.pad(work_tile, (0, pad + 1))
    # One extra batch of zero columns so a batch near the buffer end can
    # still DMA a full [16, B] slab.
    tri_T = jnp.pad(tri_T, ((0, 0), (0, B)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # tri_T in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # rays in HBM
        ],
        out_specs=[
            pl.BlockSpec((wchunk, R), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wchunk, R), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, _TRI_ROWS, B), jnp.float32),
            pltpu.VMEM((2, R, 8), jnp.float32),
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
    )(offs, cnts, tiles, tri_T, rays_tiled)
    return t_out[:wcap], i_out[:wcap]
