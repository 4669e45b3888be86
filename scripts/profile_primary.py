"""Primary-trace sub-stage breakdown on the real TPU."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import time
import numpy as np
import jax, jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild
from ugrt.trace import primary as tprim
from ugrt.trace import pallas_tracer as ptr

cfg = RenderConfig()
sc = procedural.cathedral(num_faces_target=75000)
spec = cam.CameraSpec(eye=(3,15,5), look_at=(13,13,3), up=(0,0,1), near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
cap = cfg.pair_capacity(sc.num_faces)
verts = jnp.asarray(sc.vertices); faces = jnp.asarray(sc.faces)

def timeit(name, fn, *args, n=5, **kw):
    out = fn(*args, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:9.1f} ms", flush=True)
    return out

grid8 = jax.jit(lambda v: gbuild.build_perspective_grid(
    v, faces, cc, cfg=cfg, capacity=cap, align=8))(verts)
jax.block_until_ready(grid8)

H, W = cfg.screen_height, cfg.screen_width
eye = cc[0:3]

# 1. ray dirs + tiling
def rays_fn():
    dirs = cam.primary_ray_dirs(cc, W, H, xp=jnp)
    return tprim.tile_rays(dirs, cfg)
rays_t = timeit("ray dirs + tile", jax.jit(rays_fn))

# 2. work items
wcap = cfg.num_cells + grid8.sorted_faces.shape[0] // cfg.tri_batch
wi = timeit("make_work_items", jax.jit(
    lambda g: tprim.make_work_items(g.cell_count, g.cell_offset,
                                    cfg.tri_batch, wcap)), grid8)
print("  live items:", int(((wi.count > 0)).sum()), "of", wcap)

# 3. component-major triangle data (v2 API)
tri9 = timeit("tri_components", jax.jit(
    lambda v, g: ptr.tri_components(v, faces, g, eye)), verts, grid8)

# 4. pallas sweep only
tile_of = jnp.clip(wi.cell // cfg.num_slabs, 0, cfg.grid_x * cfg.grid_y - 1)
rays_items = jax.block_until_ready(rays_t[tile_of])
sweep = jax.jit(lambda t9, ri, o, c: ptr.work_sweep_pallas(
    t9, ri, o, c, cfg=cfg))
tmin_w, lane_w = timeit("pallas work sweep", sweep, tri9,
                        rays_items, wi.offset, wi.count)

# 5. segment-min + slab scan + outputs (the rest of trace_primary)
full = jax.jit(lambda v, g: tprim.trace_primary(
    v, faces, cc, g, cfg, backend="pallas"))
prim = timeit("trace_primary total", full, verts, grid8)
print("  hits:", int((np.asarray(prim["t"]) > 0).sum()))
