"""Micro-measurements for shadow-pass redesign decisions."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import time
import numpy as np
import jax, jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild, binning
from ugrt.trace import primary as tprim

cfg = RenderConfig()
sc = procedural.cathedral(num_faces_target=75000)
print("faces:", sc.num_faces, "backend:", jax.default_backend())
spec = cam.CameraSpec(eye=(3,15,5), look_at=(13,13,3), up=(0,0,1), near=0.1, far=100.0)
light = cam.CameraSpec(eye=(14,13,8), look_at=(14,13,0), up=(0,1,0), near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0))
lp = jnp.asarray(np.asarray(light.eye, np.float32))
cap = cfg.pair_capacity(sc.num_faces)
verts = jnp.asarray(sc.vertices); faces = jnp.asarray(sc.faces)

def timeit(name, fn, *args, n=5, **kw):
    out = fn(*args, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:9.2f} ms")
    return out

# overflow check
grid = jax.jit(lambda v: gbuild.build_perspective_grid(v, faces, cc, cfg=cfg, capacity=cap))(verts)
print("persp overflow:", bool(grid.overflow), "total:", int(grid.total_pairs), "cap:", cap)
cap2 = cfg.pair_capacity(sc.num_faces) * 2
grid2 = jax.jit(lambda v: gbuild.build_perspective_grid(v, faces, cc, cfg=cfg, capacity=cap2))(verts)
print("persp overflow @2x:", bool(grid2.overflow), "total:", int(grid2.total_pairs), "cap:", cap2)
lgrid = jax.jit(lambda v: gbuild.build_spherical_grid(v, faces, lcc, cfg=cfg, capacity=cap, align=8))(verts)
print("light overflow:", bool(lgrid.overflow), "total:", int(lgrid.total_pairs))

# raw sort costs
n = cfg.image_size
key32 = jnp.asarray(np.random.randint(0, 2**31, size=n, dtype=np.int32))
vals = jnp.arange(n, dtype=jnp.int32)
timeit("u32 sort 1M single key", jax.jit(lambda k: jax.lax.sort(k)), key32)
timeit("kv sort 1M", jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)), key32, vals)
k440 = key32[:cap]
timeit("u32 sort 440k", jax.jit(lambda k: jax.lax.sort(k)), k440)
timeit("kv sort 440k", jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)), k440, vals[:cap])
# batched row sorts
kb = key32.reshape(256, 4096)
timeit("row sort [256,4096]", jax.jit(lambda k: jnp.sort(k, axis=-1)), kb)
kt = key32.reshape(16384, 64)
timeit("row sort [16384,64]", jax.jit(lambda k: jnp.sort(k, axis=-1)), kt)

# scatter-back cost
perm = jax.lax.sort((key32, vals), num_keys=1)[1]
src = (key32 & 1).astype(jnp.int32)
timeit("scatter .at[perm].max 1M", jax.jit(lambda p, s: jnp.zeros((n,), jnp.int32).at[p].max(s)), perm, src)
timeit("gather x[perm] 1M", jax.jit(lambda p: key32[p]), perm)

# shadow work statistics under current scheme and tile scheme
prim = jax.jit(lambda v, g: tprim.trace_primary(v, faces, cc, g, cfg, backend="pallas"))(verts, jax.jit(lambda v: gbuild.build_perspective_grid(v, faces, cc, cfg=cfg, capacity=cap2, align=8))(verts))
t = prim["t"].reshape(n)
dirs = prim["ray_dir"].reshape(n, 3)
pts = cc[0:3][None] + t[:, None] * dirs
cells = binning.ray_light_cells(pts, lcc, cfg.grid_x, cfg.grid_y,
                                cfg.angular_extent, cfg.angular_extent,
                                cfg.quirks.y_forward_dot_typo, xp=jnp).reshape(n)
cells_np = np.asarray(cells)
cnt_np = np.asarray(lgrid.cell_count)
B = cfg.tri_batch
NS = cfg.num_slabs
sent = cfg.cell_sentinel

# current scheme: global sort into 64-ray blocks
sc_sorted = np.sort(cells_np)
R = cfg.max_rays_per_packet
blocks = sc_sorted.reshape(-1, R)
units = 0
for b in range(blocks.shape[0]):
    cs = np.unique(blocks[b]); cs = cs[cs < sent]
    for c in cs:
        units += max(1, -(-int(cnt_np[c * NS]) // B)) if cnt_np[c*NS] > 0 else 0
print("global-sort scheme actual units:", units)

# tile scheme: 8x8 image tiles as blocks
cells_img = cells_np.reshape(cfg.screen_height, cfg.screen_width)
tiles = cells_img.reshape(cfg.grid_y, 8, cfg.grid_x, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
tunits = 0
dist_hist = np.zeros(65, np.int64)
for b in range(tiles.shape[0]):
    cs = np.unique(tiles[b]); cs = cs[cs < sent]
    dist_hist[len(cs)] += 1
    for c in cs:
        if cnt_np[c * NS] > 0:
            tunits += -(-int(cnt_np[c * NS]) // B)
print("tile scheme actual units:", tunits)
print("distinct-cells-per-tile histogram (first 12):", dist_hist[:12])
print("cell_count stats: mean", cnt_np.mean(), "max", cnt_np.max(),
      "p99", np.percentile(cnt_np, 99))
