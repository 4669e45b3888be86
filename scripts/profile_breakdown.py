"""Fine-grained timing of primary/shadow sub-stages on TPU (v4 API).

All numbers include the axon-tunnel dispatch/fence floor printed first
(roundtrip) — subtract it to compare sub-stage costs.
"""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import numpy as np
import jax, jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild, binning
from ugrt.trace import primary as tprim, shadow as tshadow
from ugrt.trace import heavy as theavy
from ugrt.trace import pallas_tracer as pt
from ugrt.core.vecmath import dot, normalize

cfg = RenderConfig()
sc = procedural.cathedral(num_faces_target=75000)
print("faces:", sc.num_faces, "backend:", jax.default_backend())
spec = cam.CameraSpec(eye=(3, 15, 5), look_at=(13, 13, 3), up=(0, 0, 1),
                      near=0.1, far=100.0)
light = cam.CameraSpec(eye=(14, 13, 8), look_at=(14, 13, 0), up=(0, 1, 0),
                       near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0))
cap = cfg.pair_capacity(sc.num_faces)
verts = jnp.asarray(sc.vertices); faces = jnp.asarray(sc.faces)

from _timing import timeit, sync, roundtrip_ms  # noqa: E402

print(f"fence roundtrip: {roundtrip_ms():.2f} ms")

grid = timeit("grid build persp", lambda v: gbuild.build_perspective_grid(
    v, faces, cc, cfg=cfg, capacity=cap), verts)
lgrid = timeit("light grid sph", lambda v: gbuild.build_spherical_grid(
    v, faces, lcc, cfg=cfg, capacity=cap), verts)
print("  heavy faces persp:", int(grid.heavy_count),
      " sph:", int(lgrid.heavy_count))

eye = cc[0:3]
H, W = cfg.screen_height, cfg.screen_width

# --- grid build internals ---
timeit("  binning ranges", lambda v: binning.perspective_face_ranges(
    v, faces, cc, cfg.grid_x, cfg.grid_y, cfg.num_slabs, xp=jnp), verts)


def expand_sort(v):
    rr = binning.perspective_face_ranges(v, faces, cc, cfg.grid_x,
                                         cfg.grid_y, cfg.num_slabs, xp=jnp)
    light_r, hf, hc, hov, hr = gbuild._split_heavy(
        rr, cfg, cfg.heavy_threshold, cfg.heavy_capacity)
    z_lo, z_hi = binning.z_minmax(light_r["zmin"], xp=jnp)
    gz = binning.slab_bins(light_r["zmin"], z_lo, z_hi, cfg.num_slabs,
                           xp=jnp)
    return gbuild._expand_and_sort(light_r, gz, cfg, cap, 1)


timeit("  expand+sort+csr", expand_sort, verts)


def sort_only(v):
    rr = binning.perspective_face_ranges(v, faces, cc, cfg.grid_x,
                                         cfg.grid_y, cfg.num_slabs, xp=jnp)
    key = (rr["gxmin"] * cfg.grid_y + rr["gymin"]).astype(jnp.uint32)
    big = jnp.pad(key, (0, cap - key.shape[0]))
    return jax.lax.sort(big)


timeit("  lax.sort cap u32", sort_only, verts)

# --- primary internals (v4) ---
tri_w = timeit("pack_tri_windows", lambda v: pt.pack_tri_windows(
    v, faces, grid, eye), verts)
NW = tri_w.shape[0]
NS = cfg.num_slabs
num_tiles = cfg.grid_x * cfg.grid_y
NBp = num_tiles // 2
blocks2 = jnp.arange(NBp, dtype=jnp.int32)
wcap = NBp + NW


def windows_fn(g):
    k1 = (2 * blocks2) * NS
    k2 = (2 * blocks2 + 1) * NS + (NS - 1)
    lo = g.cell_offset[k1]
    hi = g.cell_offset[k2] + g.cell_count[k2]
    return pt.make_windows(lo, hi, wcap, NW)


win_idx, win_blk, _ = timeit("  make_windows", windows_fn, grid)
print("  live windows:", int((win_blk < NBp).sum()), "of", wcap)


def rays_fn(c):
    rt = tprim.tile_rays(cam.primary_ray_dirs(c, W, H, xp=jnp), cfg)
    dirs_T = jnp.swapaxes(rt.reshape(NBp, 128, 3), 1, 2)
    keyrow = jnp.broadcast_to(
        jnp.arange(num_tiles, dtype=jnp.float32).reshape(NBp, 2)[..., None],
        (NBp, 2, 64)).reshape(NBp, 1, 128)
    rb = jnp.concatenate([dirs_T, keyrow,
                          jnp.zeros((NBp, 4, 128), jnp.float32)], axis=1)
    return jnp.pad(rb, ((0, 1), (0, 0), (0, 0)))


rays_b = timeit("  ray blocks prep", rays_fn, cc)

tb, pb = timeit("  primary_sweep v4", lambda t9, rb: pt.primary_sweep(
    t9, rb, win_idx, win_blk, cfg=cfg), tri_w, rays_b)

# --- heavy sweep cost (primary) ---
co = jax.jit(lambda v: theavy.heavy_coeffs(
    v, faces, grid.heavy_faces, grid.heavy_count, eye,
    grid.heavy_ranges))(verts)
dirs_flat = jax.jit(lambda c: cam.primary_ray_dirs(c, W, H, xp=jnp))(cc)
tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
gx_r = jnp.repeat(tile_ids // cfg.grid_y, 64)
gy_r = jnp.repeat(tile_ids % cfg.grid_y, 64)
rt_flat = tprim.tile_rays(dirs_flat, cfg).reshape(-1, 3)
timeit("  heavy sweep 1Mx1024", lambda d: theavy.heavy_min_t(
    co, d, gx_r, gy_r, cfg), rt_flat)

prim = timeit("primary full (pallas)", lambda v, g: tprim.trace_primary(
    v, faces, cc, g, cfg, backend="pallas"), verts, grid)

# --- shadow internals ---
t = prim["t"].reshape(-1)
dirs_r = prim["ray_dir"].reshape(-1, 3)
n = t.shape[0]
L = lcc[0:3]
pts = eye[None] + t[:, None] * dirs_r


def shadow_cells(tt, dd):
    p = eye[None] + tt[:, None] * dd
    return binning.ray_light_cells(
        p, lcc, cfg.grid_x, cfg.grid_y, cfg.angular_extent,
        cfg.angular_extent, cfg.quirks.y_forward_dot_typo, xp=jnp
    ).reshape(n)


cells = timeit("  ray_light_cells", shadow_cells, t, dirs_r)

ray_ids = jnp.arange(n, dtype=jnp.int32)
timeit("  sort rays by cell", lambda c: jax.lax.sort((c, ray_ids),
                                                     num_keys=1), cells)
sorted_cells, sorted_ray = jax.lax.sort((cells, ray_ids), num_keys=1)
sorted_ray = jax.block_until_ready(sorted_ray)

timeit("  gather pts through perm", lambda p, sr: p[sr], pts, sorted_ray)

sh = timeit("shadow full (pallas)", lambda v, g, p: tshadow.trace_shadow(
    v, faces, lcc, g, p, eye, cfg, backend="pallas")[0],
    verts, lgrid, prim)
print("shadowed:", int(sh.sum()))
