"""Flagship-scale line-item profile with chained (fence-free) timing.

Every number is a steady-state ms/iter from scripts/_timing.chain_timeit
(zero-valued dependency chain, one final fence) — the honest method the
round-4 bench uses.  Run on the TPU chip.
"""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import numpy as np
import jax, jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.core.vecmath import dot, normalize
from ugrt.scene import procedural
from ugrt.grid import build as gbuild, binning
from ugrt.trace import primary as tprim, shadow as tshadow
from ugrt.trace import heavy as theavy
from ugrt.trace import pallas_tracer as pt
from _timing import chain_timeit, sync

cfg = RenderConfig()
sc = procedural.cathedral(num_faces_target=75000)
print("faces:", sc.num_faces, "backend:", jax.default_backend(), flush=True)
spec = cam.CameraSpec(eye=(3, 15, 5), look_at=(13, 13, 3), up=(0, 0, 1),
                      near=0.1, far=100.0)
light = cam.CameraSpec(eye=(14, 13, 8), look_at=(14, 13, 0), up=(0, 1, 0),
                       near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0))
cap = cfg.pair_capacity(sc.num_faces)
verts = jnp.asarray(sc.vertices); faces = jnp.asarray(sc.faces)
eye = cc[0:3]
L = lcc[0:3]
H, W = cfg.screen_height, cfg.screen_width
N = 5


def t(name, fn, *args, n=N):
    ms, out = chain_timeit(None, fn, *args, n=n)
    print(f"{name:40s} {ms:9.2f} ms", flush=True)
    return out


# ---------------- grid builds ----------------
grid = t("grid build persp", lambda v: gbuild.build_perspective_grid(
    v, faces, cc, cfg=cfg, capacity=cap), verts)
lgrid = t("grid build spherical", lambda v: gbuild.build_spherical_grid(
    v, faces, lcc, cfg=cfg, capacity=cap), verts)
print(f"  pairs persp: {int(grid.total_pairs)}/{cap}  heavy: "
      f"{int(grid.heavy_count)}", flush=True)
print(f"  pairs sph:   {int(lgrid.total_pairs)}/{cap}  heavy: "
      f"{int(lgrid.heavy_count)}", flush=True)

t("  persp ranges (binning)", lambda v: binning.perspective_face_ranges(
    v, faces, cc, cfg.grid_x, cfg.grid_y, cfg.num_slabs, xp=jnp), verts)
t("  sph ranges (binning)", lambda v: binning.spherical_face_ranges(
    v, faces, lcc, cfg.grid_x, cfg.grid_y, cfg.num_slabs,
    cfg.angular_extent, cfg.angular_extent,
    cfg.quirks.y_forward_dot_typo, xp=jnp), verts)


def expand_sort_persp(v):
    rr = binning.perspective_face_ranges(v, faces, cc, cfg.grid_x,
                                         cfg.grid_y, cfg.num_slabs, xp=jnp)
    lr, hf, hc, hov, hr = gbuild._split_heavy(
        rr, cfg, cfg.heavy_threshold, cfg.heavy_capacity)
    z_lo, z_hi = binning.z_minmax(lr["zmin"], xp=jnp)
    gz = binning.slab_bins(lr["zmin"], z_lo, z_hi, cfg.num_slabs, xp=jnp)
    return gbuild._expand_and_sort(lr, gz, cfg, cap, 1)


t("  persp expand+sort+csr", expand_sort_persp, verts)

zeros_cap = jnp.zeros((cap,), jnp.uint32)
t("  lax.sort u32 [cap]",
  lambda x: jax.lax.sort(x + 1), zeros_cap)

# ---------------- primary internals ----------------
prim = t("primary full (pallas)", lambda v: tprim.trace_primary(
    v, faces, cc, grid, cfg, backend="pallas"), verts)
t("primary full (pallas, heavy off)", lambda v: tprim.trace_primary(
    v, faces, cc, grid._replace(
        heavy_faces=jnp.zeros((0,), jnp.int32),
        heavy_ranges=jnp.zeros((0, 4), jnp.int32)), cfg,
    backend="pallas"), verts)

tri_w = t("  pack_tri_windows", lambda v: pt.pack_tri_windows(
    v, faces, grid, eye), verts)
NW = tri_w.shape[0]
num_tiles = cfg.grid_x * cfg.grid_y
NBp = num_tiles // 2
blocks2 = jnp.arange(NBp, dtype=jnp.int32)
wcap_p = NBp + NW


def windows_fn(off):
    k1 = (2 * blocks2)
    k2 = (2 * blocks2 + 1)
    lo = off[k1]
    hi = off[k2] + grid.cell_count[k2]
    return pt.make_windows(lo, hi, wcap_p, NW)


win_idx, win_blk, _ = t("  make_windows (primary)", windows_fn,
                        grid.cell_offset.astype(jnp.float32).astype(
                            jnp.int32))
print(f"  primary live items: {int((win_blk < NBp).sum())}/{wcap_p}",
      flush=True)

dirs_full = jax.jit(lambda c: cam.primary_ray_dirs(c, W, H, xp=jnp))(cc)
rays_t = tprim.tile_rays(dirs_full, cfg)
dirs_T = jnp.swapaxes(rays_t.reshape(NBp, 128, 3), 1, 2)
keyrow = jnp.broadcast_to(
    jnp.arange(num_tiles, dtype=jnp.float32).reshape(NBp, 2)[..., None],
    (NBp, 2, 64)).reshape(NBp, 1, 128)
rays_b = jnp.concatenate(
    [dirs_T, keyrow, jnp.zeros((NBp, 4, 128), jnp.float32)], axis=1)
rays_b = sync(jnp.pad(rays_b, ((0, 1), (0, 0), (0, 0))))

t("  primary_sweep kernel", lambda t9: pt.primary_sweep(
    t9, rays_b, win_idx, win_blk, cfg=cfg), tri_w)

co = jax.jit(lambda v: theavy.heavy_coeffs(
    v, faces, grid.heavy_faces, grid.heavy_count, eye,
    grid.heavy_ranges))(verts)
tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
gx_r = jnp.repeat(tile_ids // cfg.grid_y, 64)
gy_r = jnp.repeat(tile_ids % cfg.grid_y, 64)
rt_flat = sync(rays_t.reshape(-1, 3))
t("  heavy_min_t 1M x cap1024", lambda d: theavy.heavy_min_t(
    co, d, gx_r, gy_r, cfg), rt_flat)

mvp = cc[48:64]


def slab_scan_cost(tt):
    from ugrt.core.vecmath import transform_point
    pt_ = eye[None, None, :] + tt[..., None] * rays_t
    ndc = transform_point(mvp, pt_, xp=jnp)
    return jnp.floor(ndc[..., 2] * cfg.num_slabs)


t("  isWithin reproject 1M", slab_scan_cost, sync(jnp.ones(
    (num_tiles, 64), jnp.float32)))

# ---------------- shadow internals ----------------
sh = t("shadow full (pallas)", lambda v: tshadow.trace_shadow(
    v, faces, lcc, lgrid, prim, eye, cfg, backend="pallas")[0], verts)
t("shadow full (pallas, heavy off)", lambda v: tshadow.trace_shadow(
    v, faces, lcc, lgrid._replace(
        heavy_faces=jnp.zeros((0,), jnp.int32),
        heavy_ranges=jnp.zeros((0, 4), jnp.int32)), prim, eye, cfg,
    backend="pallas")[0], verts)

n = H * W
tt = prim["t"].reshape(n)
dirs_r = prim["ray_dir"].reshape(n, 3)
pts = sync(eye[None] + tt[:, None] * dirs_r)


def cells_fn(p):
    return binning.ray_light_cells(
        p, lcc, cfg.grid_x, cfg.grid_y, cfg.angular_extent,
        cfg.angular_extent, cfg.quirks.y_forward_dot_typo,
        xp=jnp).reshape(n)


cells = t("  ray_light_cells 1M", cells_fn, pts)
ray_ids = jnp.arange(n, dtype=jnp.int32)
t("  sort (cells, ids) 1M", lambda c: jax.lax.sort(
    (c, ray_ids), num_keys=1), cells)
sorted_cells, sorted_ray = jax.lax.sort((cells, ray_ids), num_keys=1)
sorted_ray = sync(sorted_ray)
t("  gather pts[perm] 1M", lambda p: p[sorted_ray], pts)
t("  unpermute (sort) 1M", lambda x: tshadow._unpermute(x, sorted_ray),
  sync(jnp.zeros((n,), jnp.int32)))

co_s = jax.jit(lambda v: theavy.heavy_coeffs(
    v, faces, lgrid.heavy_faces, lgrid.heavy_count, L,
    lgrid.heavy_ranges))(verts)
delta0 = pts - L[None]
dist0 = jnp.sqrt(dot(delta0, delta0))
dirs0 = sync(normalize(delta0, xp=jnp))
gx_s = cells // cfg.grid_y
gy_s = cells % cfg.grid_y
t("  heavy_shadowed 1M x cap1024", lambda d: theavy.heavy_shadowed(
    co_s, d, dist0, gx_s, gy_s, cfg), dirs0)

tri_ws = t("  pack_tri_windows_coeff", lambda v: pt.pack_tri_windows_coeff(
    v, faces, lgrid, L, win=256), verts)

# shadow window stats
NWs = tri_ws.shape[0]
R = 128
n_pad = -(-n // R) * R
NB = n_pad // R
scells = jnp.pad(sorted_cells, (0, n_pad - n),
                 constant_values=cfg.cell_sentinel)
scell_blk = scells.reshape(NB, R)
first_cell = scell_blk[:, 0]
last_real = jnp.max(jnp.where(scell_blk < cfg.cell_sentinel, scell_blk,
                              -1), axis=1)
k1 = jnp.clip(first_cell, 0, cfg.cell_sentinel - 1)
k2 = jnp.clip(last_real, 0, cfg.cell_sentinel - 1)
lo = jnp.where(last_real >= 0, lgrid.cell_offset[k1], 0)
hi = jnp.where(last_real >= 0,
               lgrid.cell_offset[k2] + lgrid.cell_count[k2], 0)
wcap_s = 6 * NB + NWs + 256
wi_s, wb_s, ovf_s = pt.make_windows(lo, hi, wcap_s, NWs, win=256)
nlive = int((wb_s < NB).sum())
print(f"  shadow live items: {nlive}/{wcap_s} (overflow={bool(ovf_s)}; "
      f"{nlive / NB:.2f} win/block)", flush=True)

rows = jnp.concatenate(
    [normalize(pts[sorted_ray] - L[None], xp=jnp),
     jnp.sqrt(dot(pts[sorted_ray] - L[None],
                  pts[sorted_ray] - L[None]))[:, None]], axis=1)
rows = jnp.pad(rows, ((0, n_pad - n), (0, 0)))
rows_T = jnp.swapaxes(rows.reshape(NB, R, 4), 1, 2)
keyrow_s = jnp.where(scell_blk < cfg.cell_sentinel,
                     scell_blk.astype(jnp.float32), -1.0)[:, None, :]
rays_s = jnp.concatenate(
    [rows_T, keyrow_s, jnp.zeros((NB, 3, R), jnp.float32)], axis=1)
guard = jnp.concatenate(
    [jnp.zeros((1, 4, R), jnp.float32),
     jnp.full((1, 1, R), -1.0, jnp.float32),
     jnp.zeros((1, 3, R), jnp.float32)], axis=1)
rays_s = sync(jnp.concatenate([rays_s, guard], axis=0))

t("  shadow_sweep kernel", lambda t9: pt.shadow_sweep(
    t9, rays_s, wi_s, wb_s, cfg=cfg), tri_ws)

# light-cell concentration stats (host)
cells_h = np.asarray(cells)
live = cells_h < cfg.cell_sentinel
u, c = np.unique(cells_h[live], return_counts=True)
print(f"  rays in grid: {live.sum()}/{n}; distinct cells: {len(u)}; "
      f"max rays/cell: {c.max()}; p99: {np.percentile(c, 99):.0f}",
      flush=True)
lc = np.asarray(lgrid.cell_count)
print(f"  light-grid cells occupied: {(lc > 0).sum()}; max tris/cell: "
      f"{lc.max()}; mean(occ): {lc[lc > 0].mean():.1f}", flush=True)
