"""BASELINE config 4: reflective 2-level render at flagship scale.

Times render_frame_reflective (primary + shadow + uniform-grid DDA
reflection bounce + mixed shading) at 1024^2 / ~75k tris on the chip,
against the non-reflective frame to isolate the bounce cost, and writes
a 1024^2 sample PNG.  Records go to BASELINE.md.
"""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from _timing import chain_timeit
from ugrt.api import io as uio
from ugrt.api.renderer import render_frame_device, render_frame_reflective
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural

cfg = dataclasses.replace(RenderConfig(), light_grid_mode="windowed")
sc = procedural.cathedral(num_faces_target=75000)
print("faces:", sc.num_faces, "backend:", jax.default_backend(), flush=True)
spec = cam.CameraSpec(eye=(3, 15, 5), look_at=(13, 13, 3), up=(0, 0, 1),
                      near=0.1, far=100.0)
light = cam.CameraSpec(eye=(14, 13, 8), look_at=(14, 13, 0), up=(0, 1, 0),
                       near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0))[None]
lp = jnp.asarray(np.asarray(light.eye, dtype=np.float32))
cap = cfg.pair_capacity(sc.num_faces)
verts = jnp.asarray(sc.vertices)
faces = jnp.asarray(sc.faces)
mat_index = jnp.asarray(sc.mat_index)
mats = jnp.asarray(sc.materials)

UDIMS = (32, 32, 32)
UCAP = 1 << 20

common = dict(cfg=cfg, capacity=cap, num_lights=1, use_spot=True,
              chunk_size=1024)

# Remote (tunnel) compiles run 150-400 s each, so the base-frame and
# reflective measurements split across processes: pass --refl-only to
# skip the base timing.
if "--refl-only" not in sys.argv:
    ms_base, base = chain_timeit(None, lambda v: render_frame_device(
        v, faces, mat_index, mats, cc, lcc, lp, **common)["color"],
        verts, n=10)
    print(f"base frame (no bounce)      {ms_base:8.2f} ms", flush=True)
    if "--base-only" in sys.argv:
        sys.exit(0)
ms_base = float("nan") if "--refl-only" in sys.argv else ms_base

out_fn = jax.jit(lambda v: render_frame_reflective(
    v, faces, mat_index, mats, cc, lcc, lp, uniform_dims=UDIMS,
    uniform_capacity=UCAP, reflectivity=0.3, max_batches=8, **common))
ms_refl, _ = chain_timeit(None, lambda v: out_fn(v)["color"], verts, n=10)
print(f"reflective frame            {ms_refl:8.2f} ms  "
      f"(bounce +{ms_refl - ms_base:.1f} ms)", flush=True)

out = out_fn(verts)
img = np.asarray(out["image"])
print("overflow:", bool(out["overflow"]),
      "refl hit frac:", float((np.asarray(out["reflection"]["face_id"])
                               >= 0).mean()), flush=True)
uio.write_png("/tmp/reflective_1024.png", img)
print("wrote /tmp/reflective_1024.png", flush=True)
