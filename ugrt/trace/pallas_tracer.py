"""Fused Pallas TPU kernels for the work-item intersection sweeps.

These replace the XLA gather + elementwise + reduce pipeline of
ugrt.trace.primary._work_chunk_min and the shadow occlusion sweep with
Mosaic kernels — the TPU analog of the reference's shared-memory inner
loops (rckernel_alpha, /root/reference/trace_kernel.cu:147-215 and
mod_light_rckernel, light_kernel.cu:120-202): where a CUDA block stages
64 triangles into shared memory and tests 64 rays against them, a kernel
program here keeps a [rays x 128-triangle] Möller–Trumbore block entirely
in VMEM registers.

Design (v2 — BlockSpec-pipelined, no manual DMA):

  * XLA pre-gathers each work item's triangle slab into a component-major
    array slabs[9, Wcap, 128] (components on the leading axis, work items
    x 128 triangle lanes behind).  The gather is measured ~free on TPU
    (slab indices are near-contiguous ranges of the sorted pair array)
    and removes the old per-item HBM DMA whose 128-lane alignment rules
    forced a 14x overfetch and made the sweep DMA-latency-bound.
  * Ray data is packed 16 work items per 128-lane block (8 lanes per
    item), so one [*, R, 128] input block feeds 16 items.
  * The kernel's grid step processes 16 items; Mosaic's automatic
    multi-buffered pipeline overlaps block fetches with compute.
  * Each item's [R rays x 128 tris] block puts rays on sublanes and
    triangles on lanes; min/argmin reduce over lanes.
  * Dead triangle lanes (beyond the item's count, or capacity padding)
    are pre-zeroed, which the |det| < epsilon test rejects — the kernel
    needs no per-item scalar descriptors at all.
  * The cross-item segment-min stays in XLA (cheap).

Operation order inside the block is IDENTICAL to the XLA path's
moller_trumbore_t / shadow test (a*b - c*d cross products, inv_det
multiply), just with transposed broadcasting — results are bitwise equal
to the XLA backend, which the parity tests assert exactly.

The kernels are combinatorial-forward only; gradients flow through
ugrt.trace.refine as usual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ugrt.config import RenderConfig
from ugrt.grid.build import DeviceGrid

_BIG = 3.0e38  # plain float: a jnp scalar would be a captured const
_NW = 16       # work items packed per kernel grid step (8 lanes each)


def _round16(n: int) -> int:
    return -(-n // _NW) * _NW


def tri_components(vertices, faces, grid: DeviceGrid, origin):
    """Component-major per-pair triangle data [9, cap].

    Rows 0:3 tvec = origin - v0, 3:6 e1, 6:9 e2 — the staging of
    trace_kernel.cu:149-175 (origin = eye) / light_kernel.cu:144-146
    (origin = light).  Padding pairs (face -1) are zeroed so the
    determinant test rejects them.
    """
    fidx = jnp.clip(grid.sorted_faces, 0, faces.shape[0] - 1)
    v = vertices[faces[fidx]]            # [cap, 3, 3]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    tvec = origin[None, :] - v0
    data = jnp.concatenate([tvec, e1, e2], axis=1)   # [cap, 9]
    data = jnp.where((grid.sorted_faces >= 0)[:, None], data, 0.0)
    return data.T                                     # [9, cap]


def gather_slabs(tri9, offsets, counts, batch: int):
    """[9, Wcap_pad16, B] per-item slabs, dead lanes zeroed.

    offsets/counts: [Wcap] int32 into the sorted pair arrays.  The
    output work-item axis is padded to a multiple of 16 (zero slabs).
    """
    wcap = offsets.shape[0]
    wpad = _round16(wcap)
    lane = jnp.arange(batch, dtype=jnp.int32)
    idx = offsets[:, None] + lane[None, :]               # [Wcap, B]
    idx = jnp.clip(idx, 0, tri9.shape[1] - 1)
    slabs = jnp.take(tri9, idx, axis=1)                  # [9, Wcap, B]
    live = lane[None, :] < counts[:, None]
    slabs = jnp.where(live[None], slabs, 0.0)
    return jnp.pad(slabs, ((0, 0), (0, wpad - wcap), (0, 0)))


def _pack_rows(rows):
    """[Wcap, R, 8] -> [Wcap/16, R, 128]: 16 items side by side on lanes."""
    wcap, R, _ = rows.shape
    wpad = _round16(wcap)
    rows = jnp.pad(rows, ((0, wpad - wcap), (0, 0), (0, 0)))
    return (rows.reshape(wpad // _NW, _NW, R, 8)
            .transpose(0, 2, 1, 3)
            .reshape(wpad // _NW, R, _NW * 8))


def _primary_kernel(slab_ref, rays_ref, t_out, i_out, *,
                    cfg: RenderConfig, R: int, B: int):
    """16 work items per grid step; [R x B] Möller–Trumbore each.

    slab_ref [9, 16, B]; rays_ref [1, R, 128] (lanes 8g:8g+3 = item g's
    dx,dy,dz); outs [1, R, 128] (lane g = item g's result).
    """
    t_cols = []
    i_cols = []
    for g in range(_NW):
        def tc(c):  # triangle component as [1, B]
            return slab_ref[c, g, :][None, :]

        def rc(c):  # ray component as [R, 1]
            return rays_ref[0, :, 8 * g + c][:, None]

        dx, dy, dz = rc(0), rc(1), rc(2)
        tvx, tvy, tvz = tc(0), tc(1), tc(2)
        e1x, e1y, e1z = tc(3), tc(4), tc(5)
        e2x, e2y, e2z = tc(6), tc(7), tc(8)

        # pvec = dir x e2 (intersectTriUV, trace_kernel.cu:4-45)
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

        reject = ((jnp.abs(det) < jnp.float32(cfg.epsilon))
                  | (u < 0) | (u > 1) | (v < 0) | (u + v > 1) | (t <= 0))
        t = jnp.where(reject, jnp.float32(_BIG), t)      # [R, B]
        t_cols.append(jnp.min(t, axis=1, keepdims=True))
        i_cols.append(jnp.argmin(t, axis=1).astype(jnp.int32)[:, None])

    R_ = t_cols[0].shape[0]
    t_out[0] = jnp.concatenate(
        t_cols + [jnp.full((R_, 128 - _NW), _BIG, jnp.float32)], axis=1)
    i_out[0] = jnp.concatenate(
        i_cols + [jnp.zeros((R_, 128 - _NW), jnp.int32)], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def work_sweep_pallas(tri9, rays_items, work_offset, work_count, *,
                      cfg: RenderConfig, interpret: bool = False):
    """Per-work-item (min t, winner LANE index) via Pallas.

    tri9: [9, cap] component-major pair data (tri_components);
    rays_items: [Wcap, R, 3] each item's ray directions;
    work_offset/work_count: [Wcap] int32.
    Returns (tmin [Wcap, R], lane [Wcap, R] int32 — the winning triangle's
    index within the item's batch; global pair = work_offset + lane).
    """
    B = cfg.tri_batch
    wcap = work_offset.shape[0]
    wpad = _round16(wcap)
    R = rays_items.shape[1]

    slabs = gather_slabs(tri9, work_offset, work_count, B)
    rays_pack = _pack_rows(
        jnp.pad(rays_items, ((0, 0), (0, 0), (0, 5))))

    n_prog = wpad // _NW
    kernel = functools.partial(_primary_kernel, cfg=cfg, R=R, B=B)
    t_out, i_out = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((9, _NW, B), lambda i: (0, i, 0)),
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_prog, R, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_prog, R, 128), jnp.int32),
        ],
        interpret=interpret,
    )(slabs, rays_pack)

    t_items = (t_out[:, :, :_NW].transpose(0, 2, 1)
               .reshape(wpad, R)[:wcap])
    i_items = (i_out[:, :, :_NW].transpose(0, 2, 1)
               .reshape(wpad, R)[:wcap])
    return t_items, i_items


def _shadow_kernel(slab_ref, rays_ref, sh_out, *, cfg: RenderConfig,
                   R: int, B: int):
    """16 shadow work items per grid step (mod_light_rckernel analog).

    slab_ref [9, 16, B] (tvec = light - v0); rays_ref [1, R, 128] with
    lanes 8g+0:3 = shadow dir, 8g+3 = light-to-point distance, 8g+4 =
    cell-match flag (1.0 when the ray's light cell equals the item's
    cell — precomputed, so the kernel needs no per-item scalars).
    """
    cols = []
    for g in range(_NW):
        def tc(c):
            return slab_ref[c, g, :][None, :]

        def rc(c):
            return rays_ref[0, :, 8 * g + c][:, None]

        dx, dy, dz = rc(0), rc(1), rc(2)
        dist_pt = rc(3)
        live_ray = rc(4) > 0.5
        tvx, tvy, tvz = tc(0), tc(1), tc(2)
        e1x, e1y, e1z = tc(3), tc(4), tc(5)
        e2x, e2y, e2z = tc(6), tc(7), tc(8)

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

        reject = ((jnp.abs(det) < jnp.float32(cfg.epsilon))
                  | (u < 0) | (u > 1) | (v < 0) | (u + v > 1) | ~live_ray)
        # intersectTri accept: nonzero t below 999999.9
        # (light_kernel.cu:43-47); negative t passes per quirk.
        hit = (~reject) & (t != 0) & (t < jnp.float32(999999.9))
        if not cfg.quirks.shadow_accept_negative_t:
            hit = hit & (t > 0)

        ox = t * dx
        oy = t * dy
        oz = t * dz
        dist_occ = jnp.sqrt(ox * ox + oy * oy + oz * oz)
        sh = hit & (dist_occ + jnp.float32(cfg.shadow_epsilon) < dist_pt)
        cols.append(jnp.max(sh.astype(jnp.int32), axis=1)[:, None])

    R_ = cols[0].shape[0]
    sh_out[0] = jnp.concatenate(
        cols + [jnp.zeros((R_, 128 - _NW), jnp.int32)], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def shadow_sweep_pallas(tri9, ray_rows_blocks, work_offset, work_count,
                        work_block, work_cell, *, cfg: RenderConfig,
                        interpret: bool = False):
    """Per-work-item shadow flags via the Pallas kernel.

    tri9: [9, cap] light-grid pair data (tvec = light - v0);
    ray_rows_blocks: [NB + 1, R, 8] sorted-stream ray blocks, lanes
    0:3 dir, 3 dist, 4 cell id (f32, exact below 2^24);
    work_*: [Wcap] int32 (block may be NB for dead items — the guard
    block row).  Returns sh [Wcap, R] int32.
    """
    B = cfg.tri_batch
    wcap = work_offset.shape[0]
    wpad = _round16(wcap)
    R = ray_rows_blocks.shape[1]

    slabs = gather_slabs(tri9, work_offset, work_count, B)

    rows = ray_rows_blocks[jnp.clip(work_block, 0,
                                    ray_rows_blocks.shape[0] - 1)]
    match = rows[:, :, 4] == work_cell[:, None].astype(jnp.float32)
    rows = jnp.concatenate(
        [rows[:, :, :4], match[:, :, None].astype(jnp.float32),
         jnp.zeros((wcap, R, 3), jnp.float32)], axis=2)
    rays_pack = _pack_rows(rows)

    n_prog = wpad // _NW
    kernel = functools.partial(_shadow_kernel, cfg=cfg, R=R, B=B)
    (sh_out,) = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((9, _NW, B), lambda i: (0, i, 0)),
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_prog, R, 128), jnp.int32),
        ],
        interpret=interpret,
    )(slabs, rays_pack)

    return (sh_out[:, :, :_NW].transpose(0, 2, 1)
            .reshape(wpad, R)[:wcap])
