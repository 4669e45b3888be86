"""Fine-grained timing of primary/shadow sub-stages on TPU."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import time
import numpy as np
import jax, jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild, binning
from ugrt.trace import primary as tprim, shadow as tshadow, pallas_tracer
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
lp = jnp.asarray(np.asarray(light.eye, np.float32))
cap = cfg.pair_capacity(sc.num_faces)
verts = jnp.asarray(sc.vertices); faces = jnp.asarray(sc.faces)


def timeit(name, fn, *args, n=5, **kw):
    f = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = f(*args, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args, **kw)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:9.2f} ms")
    return out


grid8 = timeit("grid build align8", lambda v: gbuild.build_perspective_grid(
    v, faces, cc, cfg=cfg, capacity=cap, align=8), verts)
lgrid8 = timeit("light grid align8", lambda v: gbuild.build_spherical_grid(
    v, faces, lcc, cfg=cfg, capacity=cap, align=8), verts)

eye = cc[0:3]
H, W = cfg.screen_height, cfg.screen_width

# --- grid build internals ---
r = timeit("  binning ranges", lambda v: binning.perspective_face_ranges(
    v, faces, cc, cfg.grid_x, cfg.grid_y, cfg.num_slabs, xp=jnp), verts)


def expand_sort(v):
    rr = binning.perspective_face_ranges(v, faces, cc, cfg.grid_x,
                                         cfg.grid_y, cfg.num_slabs, xp=jnp)
    light_r, hf, hc, hov, hr = gbuild._split_heavy(
        rr, cfg, cfg.heavy_threshold, cfg.heavy_capacity)
    z_lo, z_hi = binning.z_minmax(light_r["zmin"], xp=jnp)
    gz = binning.slab_bins(light_r["zmin"], z_lo, z_hi, cfg.num_slabs,
                           xp=jnp)
    return gbuild._expand_and_sort(light_r, gz, cfg, cap, 8)


timeit("  expand+sort+csr", expand_sort, verts)

# --- primary internals (pallas_tracer v2 API) ---
tri9 = timeit("tri_components", lambda v: pallas_tracer.tri_components(
    v, faces, grid8, eye), verts)

dirs = cam.primary_ray_dirs(cc, W, H, xp=jnp)
rays_t = tprim.tile_rays(dirs, cfg)
R = rays_t.shape[1]
num_tiles = cfg.grid_x * cfg.grid_y

counts = grid8.cell_count
offsets = grid8.cell_offset
wcap = cfg.num_cells + grid8.sorted_faces.shape[0] // cfg.tri_batch
work = jax.jit(lambda c, o: tprim.make_work_items(c, o, cfg.tri_batch,
                                                  wcap))(counts, offsets)
work = jax.block_until_ready(work)
print("  wcap:", wcap, "live items:", int((work.count > 0).sum()))
tile_of_work = jnp.clip(work.cell // cfg.num_slabs, 0, num_tiles - 1)

timeit("  make_work_items", lambda c, o: tprim.make_work_items(
    c, o, cfg.tri_batch, wcap), counts, offsets)

timeit("  gather_slabs", lambda t9: pallas_tracer.gather_slabs(
    t9, work.offset, work.count, cfg.tri_batch), tri9)

rays_items = jax.block_until_ready(rays_t[tile_of_work])
tw, lw = timeit("  work_sweep_pallas", lambda t9, ri: (
    pallas_tracer.work_sweep_pallas(t9, ri, work.offset, work.count,
                                    cfg=cfg)), tri9, rays_items)

timeit("  rays prep (dirs+tile+gather)", lambda c: tprim.tile_rays(
    cam.primary_ray_dirs(c, W, H, xp=jnp), cfg)[tile_of_work], cc)


def post(tmin_w, lane_w, v):
    seg = work.cell
    cells_local = cfg.num_cells
    pair_w = work.offset[:, None] + lane_w
    t_cell = jax.ops.segment_min(tmin_w, seg,
                                 num_segments=cells_local + 1)
    cand = jnp.where(tmin_w == t_cell[seg], pair_w, jnp.int32(2**31 - 1))
    win_cell = jax.ops.segment_min(cand, seg, num_segments=cells_local + 1)
    return t_cell, win_cell


timeit("  segment-min post", post, tw, lw, verts)
prim = timeit("primary full (pallas)", lambda v, g: tprim.trace_primary(
    v, faces, cc, g, cfg, backend="pallas"), verts, grid8)

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
    verts, lgrid8, prim)
print("shadowed:", int(sh.sum()))
