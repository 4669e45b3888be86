"""Fine-grained per-stage timing on the real TPU chip (two-level grid)."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import time
import numpy as np
import jax, jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild, binning
from ugrt.trace import primary as tprim, shadow as tshadow, heavy as theavy
from ugrt.diff import render_grad

cfg = RenderConfig()
sc = procedural.cathedral(num_faces_target=75000)
print("faces:", sc.num_faces, "backend:", jax.default_backend())
spec = cam.CameraSpec(eye=(3,15,5), look_at=(13,13,3), up=(0,0,1), near=0.1, far=100.0)
light = cam.CameraSpec(eye=(14,13,8), look_at=(14,13,0), up=(0,1,0), near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
lcc_single = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0)); lcc = lcc_single[None]
lp = jnp.asarray(np.asarray(light.eye, np.float32))
cap = cfg.pair_capacity(sc.num_faces)
verts = jnp.asarray(sc.vertices); faces = jnp.asarray(sc.faces)
mi = jnp.asarray(sc.mat_index); mats = jnp.asarray(sc.materials)
CH = 1024

def timeit(name, fn, *args, n=5, **kw):
    out = fn(*args, **kw); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1000:9.1f} ms")
    return out

# --- grid build stages
rng = jax.jit(lambda v: binning.perspective_face_ranges(v, faces, cc, cfg.grid_x, cfg.grid_y, cfg.num_slabs, xp=jnp))
timeit("binning (persp ranges)", rng, verts)
build8 = jax.jit(lambda v: gbuild.build_perspective_grid(v, faces, cc, cfg=cfg, capacity=cap, align=8))
grid8 = timeit("grid build persp align8", build8, verts)
print("  total pairs:", int(grid8.total_pairs), "cap:", cap,
      "overflow:", bool(grid8.overflow), "heavy:", int(grid8.heavy_count))
builds8 = jax.jit(lambda v: gbuild.build_spherical_grid(v, faces, lcc_single, cfg=cfg, capacity=cap, align=8))
lgrid8 = timeit("grid build sph align8", builds8, verts)
print("  light pairs:", int(lgrid8.total_pairs),
      "overflow:", bool(lgrid8.overflow), "heavy:", int(lgrid8.heavy_count))

# --- heavy sweep alone
dirs = jax.jit(lambda: cam.primary_ray_dirs(cc, cfg.screen_width, cfg.screen_height, xp=jnp))()
co = jax.jit(lambda v: theavy.heavy_coeffs(v, faces, grid8.heavy_faces, grid8.heavy_count, cc[0:3]))(verts)
hs = jax.jit(lambda d: theavy.heavy_min_t(co, d.reshape(-1, 3), cfg))
timeit("heavy sweep primary (1M x 1024)", hs, dirs)

# --- primary trace
trace_p = jax.jit(lambda v, g: tprim.trace_primary(v, faces, cc, g, cfg, backend="pallas"))
prim = timeit("primary trace (pallas+heavy)", trace_p, verts, grid8)
print("  hits:", int((prim["t"]>0).sum()))
trace_x = jax.jit(lambda v, g: tprim.trace_primary(v, faces, cc, g, cfg, chunk_size=CH))
grid1 = jax.jit(lambda v: gbuild.build_perspective_grid(v, faces, cc, cfg=cfg, capacity=cap))(verts)
prx = timeit("primary trace (xla+heavy)", trace_x, verts, grid1)
print("  match pallas vs xla t:", bool(jnp.array_equal(prim["t"], prx["t"])),
      " face:", bool(jnp.array_equal(prim["face_id"], prx["face_id"])))

# --- shadow pass
shad_p = jax.jit(lambda v, g, p: tshadow.trace_shadow(v, faces, lcc_single, g, p, cc[:3], cfg, backend="pallas")[0])
sh = timeit("shadow pass (pallas R=128)", shad_p, verts, lgrid8, prim)
print("  shadowed:", int(sh.sum()))
shad_x = jax.jit(lambda v, g, p: tshadow.trace_shadow(v, faces, lcc_single, g, p, cc[:3], cfg, chunk_size=CH)[0])
lgrid1 = jax.jit(lambda v: gbuild.build_spherical_grid(v, faces, lcc_single, cfg=cfg, capacity=cap))(verts)
sh2 = timeit("shadow pass (xla R=128)", shad_x, verts, lgrid1, prim)
print("  shadow match:", bool(jnp.array_equal(sh, sh2)))

# --- full pipeline
fwd = jax.jit(lambda v, m: render_grad.render_color(v, m, faces, mi, cc, lcc, lp, cfg=cfg, capacity=cap, num_lights=1, use_spot=True, chunk_size=CH, trace_backend="pallas")[0])
timeit("full forward", fwd, verts, mats)
target = jnp.zeros((1024,1024,3), jnp.float32)
def step(v, m):
    o = render_grad.render_and_grad(v, m, faces, mi, cc, lcc, lp, target, cfg=cfg, capacity=cap, num_lights=1, use_spot=True, chunk_size=CH, trace_backend="pallas")
    return o["loss"], o["grad_vertices"]
timeit("forward+backward", step, verts, mats)
