"""Render sample images (visual baseline, like the reference's results/)."""
import sys; sys.path.insert(0, "/root/repo/scripts"); import _tpu  # noqa
import dataclasses
import time

import numpy as np
import jax.numpy as jnp

from ugrt.api import io
from ugrt.api.renderer import Renderer, render_frame_reflective
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural

import jax
backend = jax.default_backend()
size = 1024 if backend == "tpu" else 256
grid = 128 if backend == "tpu" else 32
tris = 75000 if backend == "tpu" else 8000
tb = "pallas" if backend == "tpu" else "xla"

cfg = dataclasses.replace(RenderConfig(), screen_width=size,
                          screen_height=size, grid_x=grid, grid_y=grid)

# Cathedral (sibenik stand-in) with the reference camera/light presets.
sc = procedural.cathedral(num_faces_target=tris)
spec = cam.CameraSpec(eye=(3, 15, 5), look_at=(13, 13, 3), up=(0, 0, 1),
                      near=0.1, far=100.0)
light = cam.CameraSpec(eye=(14, 13, 8), look_at=(14, 13, 0), up=(0, 1, 0),
                       near=0.1, far=100.0)

r = Renderer(sc, cfg)
r.frame_cnt = 5
t0 = time.time()
out = r.render(spec, [light], (10.0, 12.0, 6.0), use_spot=True)
img = np.asarray(out["image"])
print(f"cathedral: {time.time()-t0:.1f}s, shadowed px: "
      f"{int(np.asarray(out['shadowed']).sum())}")
io.write_png("results/cathedral.png", img, flip=True)

# Cornell box with reflections (config 4 style).
cfg2 = dataclasses.replace(RenderConfig(), screen_width=512,
                           screen_height=512, grid_x=64, grid_y=64)
sc2 = procedural.cornell_box(subdiv=4)
spec2 = cam.CameraSpec(eye=(0.12, 0.07, 2.53), look_at=(-0.04, 0.01, 0.0),
                       up=(0.02, 1.0, 0.01), near=0.1, far=100.0)
light2 = cam.CameraSpec(eye=(0.13, 0.87, 0.52), look_at=(0.07, -1.0, 0.49),
                        up=(0, 0, 1), near=0.1, far=100.0)
cc = jnp.asarray(cam.camcoords_from_spec(spec2, cfg2.fovy_deg, 1.0))
lcc = jnp.asarray(cam.camcoords_from_spec(light2, cfg2.fovy_deg, 1.0))[None]
lp = jnp.asarray(np.asarray(light2.eye, np.float32))
t0 = time.time()
out2 = render_frame_reflective(
    jnp.asarray(sc2.vertices), jnp.asarray(sc2.faces),
    jnp.asarray(sc2.mat_index), jnp.asarray(sc2.materials), cc, lcc, lp,
    cfg=cfg2, capacity=cfg2.pair_capacity(sc2.num_faces), num_lights=1,
    use_spot=True, uniform_dims=(16, 16, 16), uniform_capacity=65536,
    reflectivity=0.25)
print(f"cornell reflective: {time.time()-t0:.1f}s")
io.write_png("results/cornell_reflective.png", np.asarray(out2["image"]),
             flip=True)
print("wrote results/*.png")
