"""Compare XLA vs Pallas primary trace on the real TPU."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import time
import numpy as np
import jax, jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.grid import build as gbuild
from ugrt.trace import primary as tprim

cfg = RenderConfig()
sc = procedural.cathedral(num_faces_target=75000)
spec = cam.CameraSpec(eye=(3,15,5), look_at=(13,13,3), up=(0,0,1), near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
cap = cfg.pair_capacity(sc.num_faces)
v = jnp.asarray(sc.vertices); f = jnp.asarray(sc.faces)

def timeit(name, fn, *a, n=5):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:24s} {(time.perf_counter()-t0)/n*1000:8.1f} ms")
    return out

build = jax.jit(lambda v: gbuild.build_perspective_grid(v, f, cc, cfg=cfg, capacity=cap))
grid = timeit("grid build", build, v)

tx = jax.jit(lambda v, g: tprim.trace_primary(v, f, cc, g, cfg, chunk_size=1024))
rx = timeit("primary trace (xla)", tx, v, grid)

grid8 = grid
tp = jax.jit(lambda v, g: tprim.trace_primary(v, f, cc, g, cfg, backend="pallas"))
rp = timeit("primary trace (pallas)", tp, v, grid8)
# also time the component-major pack separately (v2 API)
from ugrt.trace import pallas_tracer
packf = jax.jit(lambda v, g: pallas_tracer.pack_tri_windows(v, f, g, cc[:3]))
timeit("pack_tri_windows", packf, v, grid8)

idx = np.asarray(rx["face_id"]); idp = np.asarray(rp["face_id"])
print("face_id mismatches:", (idx != idp).sum(), "/", idx.size)
print("t max diff:", np.abs(np.asarray(rx["t"])-np.asarray(rp["t"])).max())
