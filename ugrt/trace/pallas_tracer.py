"""Fused Pallas TPU kernels for the work-item intersection sweeps (v3).

TPU analog of the reference's shared-memory inner loops (rckernel_alpha,
/root/reference/trace_kernel.cu:147-215 and mod_light_rckernel,
light_kernel.cu:120-202): where a CUDA block stages 64 triangles into
shared memory and tests 64 rays against them, a kernel program here keeps
a [128 triangles x 128 rays] Moller-Trumbore block entirely in VMEM.

Design (v3 — scalar-prefetch window scheduling, no XLA gathers):

  * Triangle pair data is packed ONCE per grid into fixed 128-triangle
    *windows* of the sorted pair array: tri_windows [NW, 128, 16]
    (window, triangle-sublane, component-lane) with components
    tvec(0:3), e1(3:6), e2(6:9), cell key(9).  NW = capacity // 128.
    This is a reshape of the sorted pair order — NOT a per-work-item
    gather (v2's gather_slabs moved ~400 MB/frame through XLA's slow
    gather path; v3 moves zero).
  * Ray data is packed into fixed 128-ray *blocks* of the natural ray
    stream: rays_blocks [NB + 1, 8, 128] (block, component-sublane,
    ray-lane); last block is an all-dead guard.  For primary rays the
    stream is tile order (two 64-ray tiles per block); for shadow rays
    it is the cell-sorted order.
  * A *work item* is (ray block b, tri window w): every ray of block b
    is tested against every triangle of window w, masked by cell-key
    equality (component 9 of the window vs the ray's own cell row), so
    foreign triangles in boundary windows and padding never hit.  The
    scheduler emits, per ray block, exactly the windows overlapping the
    pair-array span of the block's cells — contiguous because cells are
    sorted (grid/build.py CSR).
  * Both sides are fetched by Mosaic's automatic multi-buffered pipeline
    via PrefetchScalarGridSpec: the per-item (window, block) ids are
    scalar-prefetch operands consumed by the BlockSpec index maps.
    Consecutive items usually share the ray block, which Mosaic
    recognizes and skips the redundant copy.
  * Per item the kernel computes the [128 tri x 128 ray] Moller-Trumbore
    block with triangles on sublanes and rays on lanes, and reduces over
    sublanes: min/argmin (primary) or occlusion OR (shadow).  The
    cross-item combine (segment min/max over ray blocks) stays in XLA.

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
from jax.experimental.pallas import tpu as pltpu

from ugrt.config import RenderConfig
from ugrt.core.ragged import segment_ids_from_starts
from ugrt.grid.build import DeviceGrid

_BIG = 3.0e38  # plain float: a jnp scalar would be a captured const
WIN = 128      # triangles per window (pair_capacity is a multiple)
NCOMP = 16     # component lanes per triangle row (10 used, 16 for tiling)


def pack_tri_windows(vertices, faces, grid: DeviceGrid, origin):
    """[NW, 128, 16] windowed pair data (tri-sublane, component-lane).

    Components 0:3 tvec = origin - v0, 3:6 e1, 6:9 e2 — the staging of
    trace_kernel.cu:149-175 (origin = eye) / light_kernel.cu:144-146
    (origin = light); component 9 = the pair's cell key as f32 (exact
    below 2^24).  Padding pairs (face -1) are zeroed so the determinant
    test rejects them regardless of their key.
    """
    cap = grid.sorted_faces.shape[0]
    fidx = jnp.clip(grid.sorted_faces, 0, faces.shape[0] - 1)
    v = vertices[faces[fidx]]            # [cap, 3, 3]
    v0 = v[:, 0]
    e1 = v[:, 1] - v0
    e2 = v[:, 2] - v0
    tvec = origin[None, :] - v0
    data = jnp.concatenate([tvec, e1, e2], axis=1)   # [cap, 9]
    data = jnp.where((grid.sorted_faces >= 0)[:, None], data, 0.0)
    key = grid.sorted_keys.astype(jnp.float32)[:, None]
    out = jnp.concatenate(
        [data, key, jnp.zeros((cap, NCOMP - 10), jnp.float32)], axis=1)
    pad = -cap % WIN
    if pad:
        out = jnp.pad(out, ((0, pad), (0, 0)))
    return out.reshape((cap + pad) // WIN, WIN, NCOMP)


def make_windows(lo, hi, wcap: int, nwin_blocks: int):
    """Expand per-ray-block pair spans [lo, hi) into a flat window list.

    lo/hi: [NB] int32 offsets into the sorted pair array (hi <= lo means
    no work).  Returns (win_idx [wcap], win_block [wcap], overflow []):
    item u covers window win_idx[u] of tri_windows for ray block
    win_block[u].  Dead items get win_block = NB (the guard block) and
    win_idx = 0.  nwin_blocks = NW bound for clipping.
    """
    nb = lo.shape[0]
    w0 = lo // WIN
    nwin = jnp.where(hi > lo, (hi - 1) // WIN - w0 + 1, 0)
    starts = jnp.cumsum(nwin) - nwin
    total = starts[-1] + nwin[-1]
    overflow = total > wcap

    u = jnp.arange(wcap, dtype=jnp.int32)
    b = segment_ids_from_starts(starts, wcap)
    valid = u < total
    win_idx = jnp.clip(w0[b] + (u - starts[b]), 0, nwin_blocks - 1)
    return (jnp.where(valid, win_idx, 0).astype(jnp.int32),
            jnp.where(valid, b, nb).astype(jnp.int32),
            overflow)


def _cell_span(cell_offset, cell_count, k):
    """(start, end) of cell key k's real pairs in the sorted array."""
    off = cell_offset[k]
    return off, off + cell_count[k]


def _primary_kernel(win_ref, blk_ref, tri_ref, rays_ref, t_out, i_out, *,
                    cfg: RenderConfig):
    """One (ray block, tri window) item per grid step.

    tri_ref [1, 128, 16] (tri-sublane, comp-lane); rays_ref [1, 8, 128]
    (comp-sublane, ray-lane: 0:3 dir, 3 cell key); outs [1, 128].
    """
    del win_ref, blk_ref  # consumed by the BlockSpec index maps

    def tc(c):  # triangle component as [128, 1]
        return tri_ref[0][:, c][:, None]

    def rc(c):  # ray component as [1, 128]
        return rays_ref[0][c, :][None, :]

    dx, dy, dz = rc(0), rc(1), rc(2)
    ray_cell = rc(3)
    tvx, tvy, tvz = tc(0), tc(1), tc(2)
    e1x, e1y, e1z = tc(3), tc(4), tc(5)
    e2x, e2y, e2z = tc(6), tc(7), tc(8)
    tri_key = tc(9)

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
              | (u < 0) | (u > 1) | (v < 0) | (u + v > 1) | (t <= 0)
              | (tri_key != ray_cell))
    t = jnp.where(reject, jnp.float32(_BIG), t)      # [128 tri, 128 ray]
    t_out[0, 0] = jnp.min(t, axis=0)
    i_out[0, 0] = jnp.argmin(t, axis=0).astype(jnp.int32)


def _shadow_kernel(win_ref, blk_ref, tri_ref, rays_ref, sh_out, *,
                   cfg: RenderConfig):
    """Shadow item (mod_light_rckernel analog, light_kernel.cu:120-202).

    rays_ref comp rows: 0:3 shadow dir, 3 light-to-point distance,
    4 cell key.  tvec = light - v0.  Output [1, 128] int32 flags.
    """
    del win_ref, blk_ref

    def tc(c):
        return tri_ref[0][:, c][:, None]

    def rc(c):
        return rays_ref[0][c, :][None, :]

    dx, dy, dz = rc(0), rc(1), rc(2)
    dist_pt = rc(3)
    ray_cell = rc(4)
    tvx, tvy, tvz = tc(0), tc(1), tc(2)
    e1x, e1y, e1z = tc(3), tc(4), tc(5)
    e2x, e2y, e2z = tc(6), tc(7), tc(8)
    tri_key = tc(9)

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
              | (u < 0) | (u > 1) | (v < 0) | (u + v > 1)
              | (tri_key != ray_cell))
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
    sh_out[0, 0] = jnp.max(sh.astype(jnp.int32), axis=0)


def _sweep_call(kernel, tri_windows, rays_blocks, win_idx, win_block,
                out_shapes, interpret: bool):
    wcap = win_idx.shape[0]
    # Outputs are [wcap, 1, 128] with block (1, 1, 128): Mosaic requires
    # the block's last two dims to divide (8, 128) or equal the array
    # dims — a 2D (1, 128) block over [wcap, 128] fails that check.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(wcap,),
        in_specs=[
            pl.BlockSpec((1, WIN, NCOMP),
                         lambda i, win, blk: (win[i], 0, 0)),
            pl.BlockSpec((1, 8, 128),
                         lambda i, win, blk: (blk[i], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, win, blk: (i, 0, 0))
            for _ in out_shapes
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((wcap, 1, 128), dt)
                   for dt in out_shapes],
        interpret=interpret,
    )(win_idx, win_block, tri_windows, rays_blocks)
    return [o.reshape(wcap, 128) for o in outs]


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def primary_sweep(tri_windows, rays_blocks, win_idx, win_block, *,
                  cfg: RenderConfig, interpret: bool = False):
    """Per-item (min t [wcap, 128], winner sublane [wcap, 128] i32).

    Winner global pair index = win_idx * 128 + sublane.  Dead items
    (guard ray block: cell row -1) return t = _BIG.
    """
    return tuple(_sweep_call(
        functools.partial(_primary_kernel, cfg=cfg),
        tri_windows, rays_blocks, win_idx, win_block,
        (jnp.float32, jnp.int32), interpret))


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def shadow_sweep(tri_windows, rays_blocks, win_idx, win_block, *,
                 cfg: RenderConfig, interpret: bool = False):
    """Per-item shadow flags [wcap, 128] int32."""
    (sh,) = _sweep_call(
        functools.partial(_shadow_kernel, cfg=cfg),
        tri_windows, rays_blocks, win_idx, win_block,
        (jnp.int32,), interpret)
    return sh
