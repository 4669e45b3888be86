"""Shadow-pass and grid-build sub-stage breakdown on the real TPU."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import time
import numpy as np
import jax, jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild, binning
from ugrt.trace import primary as tprim, shadow as tshadow

cfg = RenderConfig()
sc = procedural.cathedral(num_faces_target=75000)
spec = cam.CameraSpec(eye=(3,15,5), look_at=(13,13,3), up=(0,0,1), near=0.1, far=100.0)
light = cam.CameraSpec(eye=(14,13,8), look_at=(14,13,0), up=(0,1,0), near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0))
cap = cfg.pair_capacity(sc.num_faces)
verts = jnp.asarray(sc.vertices); faces = jnp.asarray(sc.faces)

from _timing import timeit, sync, roundtrip_ms  # noqa: E402

full = jax.jit(lambda v: gbuild.build_perspective_grid(
    v, faces, cc, cfg=cfg, capacity=cap))
grid8 = timeit("grid: full build align=8", full, verts)

trace_p = jax.jit(lambda v, g: tprim.trace_primary(
    v, faces, cc, g, cfg, backend="pallas"))
prim = timeit("primary trace (pallas, total)", trace_p, verts, grid8)

lgrid8 = jax.jit(lambda v: gbuild.build_spherical_grid(
    v, faces, lcc, cfg=cfg, capacity=cap))(verts)

full_sh = jax.jit(lambda v, g, p: tshadow.trace_shadow(
    v, faces, lcc, g, p, cc[:3], cfg, backend="pallas"))
sh2, ovf2 = timeit("shadow: full pallas pass", full_sh, verts, lgrid8, prim)
print("  pallas overflow:", bool(ovf2))

lgrid = jax.jit(lambda v: gbuild.build_spherical_grid(
    v, faces, lcc, cfg=cfg, capacity=cap))(verts)
full_x = jax.jit(lambda v, g, p: tshadow.trace_shadow(
    v, faces, lcc, g, p, cc[:3], cfg, chunk_size=1024))
sh1, ovf1 = timeit("shadow: full xla pass", full_x, verts, lgrid, prim)
print("  xla overflow:", bool(ovf1))

a = np.asarray(sh1); b = np.asarray(sh2)
print("mismatch pixels:", int((a != b).sum()), "/", a.size,
      " shadowed:", int(a.sum()), int(b.sum()))
