"""Primary-trace sub-stage breakdown on the real TPU (v3 kernels)."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import numpy as np
import jax, jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild
from ugrt.trace import primary as tprim
from ugrt.trace import pallas_tracer as pt

cfg = RenderConfig()
sc = procedural.cathedral(num_faces_target=75000)
spec = cam.CameraSpec(eye=(3,15,5), look_at=(13,13,3), up=(0,0,1), near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
cap = cfg.pair_capacity(sc.num_faces)
verts = jnp.asarray(sc.vertices); faces = jnp.asarray(sc.faces)

from _timing import timeit, sync, roundtrip_ms  # noqa: E402
print("sync roundtrip:", round(roundtrip_ms(), 2), "ms (subtract from all)")

grid = jax.jit(lambda v: gbuild.build_perspective_grid(
    v, faces, cc, cfg=cfg, capacity=cap))(verts)
sync(grid)

H, W = cfg.screen_height, cfg.screen_width
eye = cc[0:3]
NS = cfg.num_slabs
num_tiles = cfg.grid_x * cfg.grid_y
NBp = num_tiles // 2

# 1. ray blocks
def rays_fn():
    dirs = cam.primary_ray_dirs(cc, W, H, xp=jnp)
    rt = tprim.tile_rays(dirs, cfg)
    dirs_T = jnp.swapaxes(rt.reshape(NBp, 128, 3), 1, 2)
    keyrow = jnp.broadcast_to(
        jnp.arange(num_tiles, dtype=jnp.float32).reshape(NBp, 2)[..., None],
        (NBp, 2, 64)).reshape(NBp, 1, 128)
    rb = jnp.concatenate([dirs_T, keyrow,
                          jnp.zeros((NBp, 4, 128), jnp.float32)], axis=1)
    return jnp.pad(rb, ((0, 1), (0, 0), (0, 0)))
rays_b = timeit("ray blocks (dirs+tile+pack)", jax.jit(rays_fn))

# 2. tri windows
tri_w = timeit("pack_tri_windows", jax.jit(
    lambda v, g: pt.pack_tri_windows(v, faces, g, eye)), verts, grid)
NW = tri_w.shape[0]

# 3. window list
blocks2 = jnp.arange(NBp, dtype=jnp.int32)
wcap = NBp + NW
def windows_fn(g):
    k1 = (2 * blocks2) * NS
    k2 = (2 * blocks2 + 1) * NS + (NS - 1)
    lo = g.cell_offset[k1]
    hi = g.cell_offset[k2] + g.cell_count[k2]
    return pt.make_windows(lo, hi, wcap, NW)
win_idx, win_blk, _ = timeit("make_windows", jax.jit(windows_fn), grid)
print("  live windows:", int((win_blk < NBp).sum()), "of", wcap)

# 4. pallas sweep only
sweep = jax.jit(lambda tw, rb, wi, wb: pt.primary_sweep(
    tw, rb, wi, wb, cfg=cfg))
t_w, lane_w = timeit("primary_sweep (pallas)", sweep, tri_w, rays_b,
                     win_idx, win_blk)

# 5. combine
def combine(t_w, lane_w):
    t_blk = jax.ops.segment_min(t_w, win_blk, num_segments=NBp + 1)
    pair_w = win_idx[:, None] * pt.WIN + lane_w
    cand = jnp.where(t_w == t_blk[win_blk], pair_w, jnp.int32(2**31 - 1))
    p_blk = jax.ops.segment_min(cand, win_blk, num_segments=NBp + 1)
    return t_blk, p_blk
timeit("segment-min combine", jax.jit(combine), t_w, lane_w)

# 6. full
full = jax.jit(lambda v, g: tprim.trace_primary(
    v, faces, cc, g, cfg, backend="pallas"))
prim = timeit("trace_primary total", full, verts, grid)
print("  hits:", int((np.asarray(prim["t"]) > 0).sum()))
