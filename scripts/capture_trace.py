"""Capture a jax.profiler trace of the flagship fwd+bwd step on TPU.

Writes a perfetto trace; scripts/parse_trace.py aggregates op times.
"""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import dataclasses
import glob

import jax
import jax.numpy as jnp
import numpy as np

from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.diff import render_grad
from ugrt.scene import procedural

mode = "reference" if "--pi-extent" in sys.argv else "windowed"
cfg = dataclasses.replace(RenderConfig(), light_grid_mode=mode)
sc = procedural.cathedral(num_faces_target=75000)
spec = cam.CameraSpec(eye=(3, 15, 5), look_at=(13, 13, 3), up=(0, 0, 1),
                      near=0.1, far=100.0)
light = cam.CameraSpec(eye=(14, 13, 8), look_at=(14, 13, 0), up=(0, 1, 0),
                       near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, 1.0))
lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, 1.0))[None]
lp = jnp.asarray(np.asarray(light.eye, dtype=np.float32))
cap = cfg.pair_capacity(sc.num_faces)
verts = jnp.asarray(sc.vertices)
mats = jnp.asarray(sc.materials)
faces = jnp.asarray(sc.faces)
mat_index = jnp.asarray(sc.mat_index)
target = jnp.zeros((cfg.screen_height, cfg.screen_width, 3), jnp.float32)


def step(v):
    out = render_grad.render_and_grad(
        v, mats, faces, mat_index, cc, lcc, lp, target, cfg=cfg,
        capacity=cap, num_lights=1, use_spot=True, chunk_size=1024,
        trace_backend="pallas")
    return out["loss"], out["grad_vertices"]


loss, gv = step(verts)
print("warm, loss:", float(loss), flush=True)

outdir = "/tmp/jxtrace"
jax.profiler.start_trace(outdir)
v = verts
for _ in range(3):
    loss, gv = step(v)
    v = v + gv * 0.0
print("traced, loss:", float(loss), flush=True)
jax.profiler.stop_trace()
print("files:", glob.glob(outdir + "/**/*", recursive=True)[-5:])
