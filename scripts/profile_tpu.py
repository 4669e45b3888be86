"""Per-stage timing on the real TPU chip."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild
from ugrt.trace import primary as tprim, shadow as tshadow
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

from _timing import timeit, sync, roundtrip_ms  # noqa: E402

build_p = jax.jit(lambda v: gbuild.build_perspective_grid(v, faces, cc, cfg=cfg, capacity=cap))
grid = timeit("grid build (persp)", build_p, verts)
print("  total pairs:", int(grid.total_pairs), "cap:", cap)

build_s = jax.jit(lambda v: gbuild.build_spherical_grid(v, faces, lcc_single, cfg=cfg, capacity=cap))
lgrid = timeit("grid build (spherical)", build_s, verts)
print("  light pairs:", int(lgrid.total_pairs))

trace = jax.jit(lambda v, g: tprim.trace_primary(v, faces, cc, g, cfg, chunk_size=CH))
prim = timeit("primary trace (xla)", trace, verts, grid)
build_p8 = jax.jit(lambda v: gbuild.build_perspective_grid(v, faces, cc, cfg=cfg, capacity=cap))
grid8 = timeit("grid build (align=8)", build_p8, verts)
trace_p = jax.jit(lambda v, g: tprim.trace_primary(v, faces, cc, g, cfg, backend="pallas"))
prim = timeit("primary trace (pallas)", trace_p, verts, grid8)
print("  hits:", int((prim["t"]>0).sum()))

shad = jax.jit(lambda v, g, p: tshadow.trace_shadow(v, faces, lcc_single, g, p, cc[:3], cfg, chunk_size=CH)[0])
sh = timeit("shadow pass (xla)", shad, verts, lgrid, prim)
build_s8 = jax.jit(lambda v: gbuild.build_spherical_grid(v, faces, lcc_single, cfg=cfg, capacity=cap))
lgrid8 = timeit("grid build (sph align8)", build_s8, verts)
shad_p = jax.jit(lambda v, g, p: tshadow.trace_shadow(v, faces, lcc_single, g, p, cc[:3], cfg, backend="pallas")[0])
sh2 = timeit("shadow pass (pallas)", shad_p, verts, lgrid8, prim)
import numpy as _np
print("  shadow match:", _np.array_equal(_np.asarray(sh), _np.asarray(sh2)), int(sh2.sum()))
print("  shadowed:", int(sh.sum()))

fwd = jax.jit(lambda v, m: render_grad.render_color(v, m, faces, mi, cc, lcc, lp, cfg=cfg, capacity=cap, num_lights=1, use_spot=True, chunk_size=CH, trace_backend="pallas")[0])
timeit("full forward", fwd, verts, mats)

target = jnp.zeros((1024,1024,3), jnp.float32)
def step(v, m):
    o = render_grad.render_and_grad(v, m, faces, mi, cc, lcc, lp, target, cfg=cfg, capacity=cap, num_lights=1, use_spot=True, chunk_size=CH, trace_backend="pallas")
    return o["loss"], o["grad_vertices"]
timeit("forward+backward", step, verts, mats)
