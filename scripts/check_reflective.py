import sys; sys.path.insert(0, "/root/repo/scripts"); import _cpu  # noqa
import numpy as np, dataclasses, warnings
warnings.filterwarnings("ignore"); np.seterr(all="ignore")
import jax.numpy as jnp
from ugrt.config import RenderConfig
from ugrt.core import camera as cam
from ugrt.scene import procedural
from ugrt.api import renderer as rdr

cfg = dataclasses.replace(RenderConfig(), screen_width=128, screen_height=128, grid_x=16, grid_y=16)
sc = procedural.cornell_box(subdiv=2)
spec = cam.CameraSpec(eye=(0.123,0.071,2.531), look_at=(-0.037,0.011,0.0), up=(0.02,1.0,0.013), near=0.1, far=100.0)
light = cam.CameraSpec(eye=(0.13,0.87,0.52), look_at=(0.07,-1.0,0.49), up=(0,0,1), near=0.1, far=100.0)
aspect = 1.0
cc = jnp.asarray(cam.camcoords_from_spec(spec, cfg.fovy_deg, aspect))
lcc = jnp.asarray(cam.camcoords_from_spec(light, cfg.fovy_deg, aspect))[None]
lp = jnp.asarray(np.asarray(light.eye, dtype=np.float32))
cap = cfg.pair_capacity(sc.num_faces)
out = rdr.render_frame_reflective(
    jnp.asarray(sc.vertices), jnp.asarray(sc.faces), jnp.asarray(sc.mat_index),
    jnp.asarray(sc.materials), cc, lcc, lp, cfg=cfg, capacity=cap, num_lights=1,
    use_spot=True, uniform_dims=(8,8,8), uniform_capacity=16384)
img = np.asarray(out["image"])
print("reflective render ok; overflow:", bool(out["overflow"]))
print("mean rgb:", img.mean(axis=(0,1)), "refl hits:", (np.asarray(out["reflection"]["face_id"])>=0).sum())
